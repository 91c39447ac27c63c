"""Flagship-shape multichip certification (VERDICT r4 missing-#4).

Runs dryrun_multichip with flagship=True — the zoo's mit_b3/320px
regression config, remat on, fused heads on — over an 8-device virtual CPU
mesh: one pjit train step + one sharded inference batch in the production
shapes, so the TP-divisibility gates (parallel/sharding.py) and the
fused-head shapes meet the mesh in one program. Writes the artifact to
docs/artifacts/multichip_flagship_r5.json.

Slow (full mit_b3 fwd+bwd at 320px on CPU) but it runs once.

Usage:
    timeout 3600 python tools/dryrun_flagship.py [n_devices]
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ART = os.path.join(REPO, "docs", "artifacts", "multichip_flagship_r5.json")

_CHILD = "_PF_FLAGSHIP_CHILD"


def child(n_devices: int):
    sys.path.insert(0, REPO)
    import __graft_entry__ as g

    t0 = time.perf_counter()
    info = g.dryrun_multichip(n_devices, flagship=True)
    info["wall_seconds"] = round(time.perf_counter() - t0, 1)
    os.makedirs(os.path.dirname(ART), exist_ok=True)
    with open(ART, "w") as f:
        json.dump(info, f, indent=2)
    print(f"wrote {ART}")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    if os.environ.get(_CHILD) == "1":
        child(n)
        return
    # fresh interpreter with the CPU-mesh env prepared before backend init
    # (the axon sitecustomize pins a 1-chip TPU backend otherwise) — the
    # recipe, including the marker that stops __graft_entry__ from
    # re-execing a second time, lives in one place: cpu_mesh_child_env
    sys.path.insert(0, REPO)
    import __graft_entry__ as g

    env = g.cpu_mesh_child_env(n)
    env[_CHILD] = "1"
    rc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), str(n)], env=env, cwd=REPO
    ).returncode
    sys.exit(rc)


if __name__ == "__main__":
    main()
