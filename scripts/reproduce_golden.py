"""Reproduce the reference's qualitative golden results.

Trains a model for 20,000 steps on the 2D `normals` density (the dataset of
/root/reference/results/density/*) and copies the step-20000 report panels
into results/density/<model>/ — the qualitative parity gate of BASELINE.md.

Usage: python scripts/reproduce_golden.py <network> [extra overrides...]
"""
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    network = sys.argv[1]
    extra = sys.argv[2:]
    import main as train_main

    argv = [f"network={network}", "run.distrib=normals",
            "train.steps=20000", "train.chunk=100", "run.display=10",
            "run.save_all_reports=true"] + extra
    run_dir = train_main.main(argv)

    out_dir = os.path.join("results", "density", network.replace("+", "p"))
    os.makedirs(out_dir, exist_ok=True)
    for name in ("y_data", "y_sample", "z_sample", "y_dist"):
        src = os.path.join(run_dir, f"{name}_020000.jpg")
        if os.path.exists(src):
            shutil.copyfile(src, os.path.join(out_dir, f"{name}_020000.jpg"))

    # training movie from the periodic sample frames
    import glob as _glob
    from nf_tpu.utils.plotting import assemble_gif
    frames = sorted(_glob.glob(os.path.join(run_dir, "y_sample_0*.jpg")))
    if frames:
        assemble_gif(frames, os.path.join(out_dir, "movie.gif"))
    print(f"golden panels -> {out_dir}")


if __name__ == "__main__":
    main()
