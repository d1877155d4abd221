"""Regenerate tests/goldens.json (run on the CPU backend for determinism)."""
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
import test_golden_nll as g


def main():
    out = {}
    for name in sorted(g.CONFIGS):
        out[name] = g._compute(name)
        print(name, out[name])
    with open(g.GOLDEN_PATH, "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
