"""Extract a bits/dim training curve from a run dir's metrics.jsonl.

Usage: python scripts/extract_curve.py <run_dir> <out.json> <run-label>
       [tag=image/train/bits_per_dim_discrete]

Falls back to image/train/bits_per_dim (+8 offset NOT applied) when the
discrete tag is absent (runs without run.dequantize, e.g. vardequant
flow++ where the train loss already carries the discrete correction).
"""
import json
import sys


def main():
    run_dir, out, label = sys.argv[1], sys.argv[2], sys.argv[3]
    tag = sys.argv[4] if len(sys.argv) > 4 else None
    rows = [json.loads(l) for l in open(f"{run_dir}/metrics.jsonl")]
    tags = {r["tag"] for r in rows}
    if tag is None:
        tag = ("image/train/bits_per_dim_discrete"
               if "image/train/bits_per_dim_discrete" in tags
               else "image/train/bits_per_dim")
    d = {}
    for r in rows:
        if r["tag"] == tag:
            d[r["step"]] = r["value"]
    pts = sorted(d.items())
    doc = {"metric": tag, "run": label,
           "points": [list(p) for p in pts]}
    json.dump(doc, open(out, "w"), indent=1)
    print(f"{len(pts)} points, last {pts[-1] if pts else None}")


if __name__ == "__main__":
    main()
