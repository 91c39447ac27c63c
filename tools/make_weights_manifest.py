"""Generate the released-checkpoint manifest (VERDICT r4 next-#4a).

For each zoo version, records the weights URL, the full expected tensor
inventory (state_dict name -> shape, derived offline from the reference's
own torch graph built against tests/_ref_stubs), a digest of that
inventory, and a slot for the released file's sha256 — null until the
first verified download pins it (trust-on-first-use; enforced thereafter).
tools/fetch_and_verify.py validates every download against this manifest
before converting, so a truncated/hijacked/renamed file can never reach
the parity harness silently.

Usage:
    python tools/make_weights_manifest.py          # writes MANIFEST.json
"""

import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

MANIFEST = os.path.join(
    REPO, "perspectivefields_tpu", "weights", "MANIFEST.json"
)


def inventory(version: str) -> dict:
    """state_dict name -> shape for the reference graph of `version`."""
    from test_reference_parity import _import_reference

    RefPF = _import_reference()
    orig = RefPF._init_weights
    RefPF._init_weights = lambda self: None
    try:
        ref = RefPF(version).eval()
    finally:
        RefPF._init_weights = orig
    return {k: list(v.shape) for k, v in ref.state_dict().items()}


def inventory_digest(inv: dict) -> str:
    lines = "\n".join(f"{k}:{tuple(v)}" for k, v in sorted(inv.items()))
    return hashlib.sha256(lines.encode()).hexdigest()


def main():
    from perspectivefields_tpu.config import model_zoo

    prev = {}
    if os.path.exists(MANIFEST):
        with open(MANIFEST) as f:
            prev = json.load(f)

    out = {}
    for version, entry in model_zoo.items():
        inv = inventory(version)
        out[version] = {
            "weights_url": entry.get("weights_url"),
            # preserved across regenerations once a verified download pins it
            "pth_sha256": prev.get(version, {}).get("pth_sha256"),
            "tensor_count": len(inv),
            "inventory_sha256": inventory_digest(inv),
            "tensors": inv,
        }
        print(f"{version}: {len(inv)} tensors, "
              f"inv={out[version]['inventory_sha256'][:12]}")
    os.makedirs(os.path.dirname(MANIFEST), exist_ok=True)
    with open(MANIFEST, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {MANIFEST}")


if __name__ == "__main__":
    main()
