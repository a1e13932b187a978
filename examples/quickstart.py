"""End-to-end ccmh quickstart on synthetic data — no downloads, no datasets.

Walks the full stack a migrating reference user touches, in one script:

1. writes a synthetic ``.mat`` dataset (the reference's
   ``index.mat``/``caption.mat``/``label.mat`` layout, dataset/base.py);
2. trains a method for a few epochs through the real CLI surface
   (``python -m ccmh.cli`` flags, main.py:18-46 parity) with full-state
   checkpointing;
3. re-runs in ``--test`` mode (4-way mAP + PR/topN curve dump,
   train/base.py:277-323 parity);
4. loads the trained checkpoint into a :class:`ccmh.retrieval.Retriever`
   and serves a text→image top-k search over a freshly encoded gallery —
   the deployment path the reference does not have.

Run::

    python examples/quickstart.py                # ~2-4 min on CPU or 1 TPU
    python examples/quickstart.py --method DSPH --epochs 4 --bits 32
"""

import argparse
import os
import sys
import tempfile

try:
    import ccmh  # noqa: F401  (pip-installed)
except ImportError:  # running from a checkout: repo root is one level up
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--method", default="DCHMT",
                    help="any of the 14 registered methods")
    ap.add_argument("--bits", type=int, default=16, help="hash code length")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--workdir", default="",
                    help="where to put data + results (default: a tmp dir)")
    args = ap.parse_args()

    work = args.workdir or tempfile.mkdtemp(prefix="ccmh_quickstart_")
    data_dir = os.path.join(work, "data")
    save_dir = os.path.join(work, "result")

    # 1. synthetic dataset in the reference .mat layout ----------------------
    from ccmh.data.synthetic import write_synthetic_mat_dataset

    if not os.path.isdir(data_dir):
        # jpeg=True: real .jpg files + an index.mat of paths — the reference
        # dataset layout, also exercising the native C++ batch loader
        write_synthetic_mat_dataset(data_dir, n=48, n_class=6, resolution=32,
                                    jpeg=True)
    print(f"[1/4] dataset at {data_dir}")

    # 2. train through the real CLI surface ----------------------------------
    from ccmh.cli import main as ccmh_main

    common = [
        "--method", args.method, "--dataset", "synthetic",
        "--output-dim", str(args.bits),
        "--data-dir", data_dir, "--save-dir", save_dir,
        "--batch-size", "12", "--query-num", "12", "--train-num", "24",
        "--eval-batch", "12", "--clip-arch", "tiny",
    ]
    centers = ""
    if args.method == "TwDH":
        # TwDH needs class-center assets; generate them for this dataset
        # (the reference cannot do this at all — it ships 3 fixed pickles)
        from ccmh.data.builders.twdh_centers import main as gen_centers

        centers = os.path.join(work, "twdh_centers.npz")
        gen_centers(["--nclass", "6", "--long-dims", str(args.bits),
                     "--short-dims", str(max(args.bits // 2, 4)),
                     "--out", centers])
        common += ["--set", f"twdh.center_path={centers}"]
    ccmh_main(common + ["--epochs", str(args.epochs), "--checkpoint-every", "1",
                        "--save-model"])
    run_dir = os.path.join(save_dir, args.method, "synthetic", str(args.bits))
    print(f"[2/4] trained; artifacts in {run_dir}")

    # 3. --test mode: 4-way mAP + PR/topN curves ------------------------------
    ckpt = os.path.join(run_dir, f"model-{args.epochs - 1}.npz")
    ccmh_main(common + ["--test", "--pretrained", ckpt])
    print(f"[3/4] test eval done (PR curves under {run_dir}/PR_cruve)")

    # 4. serve: checkpoint -> Retriever -> text->image top-k -----------------
    import numpy as np

    from ccmh.clip.model import ClipConfig
    from ccmh.config import Config
    from ccmh.retrieval import Retriever

    cfg = Config(method=args.method, output_dim=args.bits,
                 nclass=6, pretrained=ckpt, max_words=32)
    if centers:
        cfg.twdh.center_path = centers
    r = Retriever.from_pretrained(cfg, clip_cfg=ClipConfig.tiny())

    gallery_imgs = _load_gallery_images(data_dir, n=24)
    index = r.build_image_index(images=gallery_imgs)
    dists, ids = r.search_text2image(
        ["a photo of a dog", "two people at the beach"], index, k=5)
    for q, (d_row, i_row) in enumerate(zip(np.asarray(dists), np.asarray(ids))):
        print(f"[4/4] query {q}: top-5 gallery ids {i_row.tolist()} "
              f"at Hamming distances {d_row.tolist()}")
    print(f"done — everything under {work}")


def _load_gallery_images(data_dir: str, n: int):
    """Decode the first n dataset JPEGs with the serving ingestion path
    (native C++ batch loader when available, PIL fallback otherwise)."""
    import scipy.io as scio

    from ccmh.data.dataset import images_from_bytes

    index = scio.loadmat(os.path.join(data_dir, "index.mat"))["index"]
    paths = [str(p).strip() for p in index[:n]]
    blobs = [open(p, "rb").read() for p in paths]
    return images_from_bytes(blobs, resolution=32)


if __name__ == "__main__":
    main()
