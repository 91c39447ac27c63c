"""Empty transforms namespace (unused by the parity tests)."""


def __getattr__(name):
    raise NotImplementedError(f"torchvision stub: transforms.{name} unavailable")
