from setuptools import find_packages, setup

setup(
    name="perspectivefields-tpu",
    version="0.1.0",
    description=(
        "TPU-native (JAX/XLA/Pallas) single-image camera calibration: dense "
        "perspective fields + camera parameter regression"
    ),
    packages=find_packages(include=["perspectivefields_tpu*"]),
    package_data={"perspectivefields_tpu": ["weights/*.npz"]},
    python_requires=">=3.10",
    install_requires=[
        "jax",
        "flax",
        "optax",
        "orbax-checkpoint",
        "numpy",
        "pillow",
        "matplotlib",
    ],
    extras_require={
        "convert": ["torch"],
        "demo": ["opencv-python"],
        "test": ["pytest", "torch", "scipy"],
    },
)
