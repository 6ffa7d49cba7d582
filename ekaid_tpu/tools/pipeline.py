"""One-command pipeline orchestrator: raw images → trained VQA model.

The reference requires running ~8 scripts by hand in order
(feature extraction/README.md + model/README.md). This orchestrator
chains the framework's stages with consistent paths under one data root:

  convert     images → 1024² PNGs + dicom2id         (data/images.py)
  detector    train anatomy + disease detectors      (train_detector)
  extract     batched features → cmb_bbox_di_feats   (extract/runner)
  preprocess  QA csv → packed arrays + vocab + GT    (data/preprocess)
  train       VQA training with eval snapshots       (train/train)
  test        batch inference + metrics              (train/test)

Each stage is skippable/resumable: it is skipped when its artifact
already exists unless --force. `--stage all --synthetic` runs the whole
chain on generated data for validation.
"""

from __future__ import annotations

import argparse
import os


STAGES = ("convert", "detector", "extract", "preprocess", "train",
          "test")


def _exists(*paths) -> bool:
    return all(os.path.exists(p) for p in paths)


def run_pipeline(a) -> None:
    root = a.data_root
    os.makedirs(root, exist_ok=True)
    png_dir = os.path.join(root, "pngs")
    ana_ckpt = os.path.join(root, "ckpt_anatomy")
    dis_ckpt = os.path.join(root, "ckpt_disease")
    feats = os.path.join(root, "cmb_bbox_di_feats.hdf5")
    npz = os.path.join(root, "vqa_dataset.npz")
    workdir = os.path.join(root, "run")

    stages = STAGES if a.stage == "all" else (a.stage,)

    if "convert" in stages and a.image_dir:
        if a.force or not _exists(png_dir):
            from ekaid_tpu.data.images import convert_tree
            n = convert_tree(a.image_dir, png_dir)
            print(f"[convert] {n} images → {png_dir}")
        else:
            print("[convert] skipped (exists)")

    if "detector" in stages:
        if a.force or not _exists(ana_ckpt):
            from ekaid_tpu.train import train_detector as td
            args = ["--steps", str(a.detector_steps),
                    "--image_size", str(a.image_size),
                    "--ckpt_out", ana_ckpt, "--which", "anatomy"]
            if a.synthetic:
                args += ["--synthetic", str(max(64, a.synthetic))]
            elif a.scene_graph_dir:
                # silver ImaGenome stage (the reference's primary
                # anatomy data path, train_anatomy.py:148-232)
                args += ["--scene_graph_dir", a.scene_graph_dir,
                         "--shapes_pkl",
                         a.shapes_pkl or f"{png_dir}/mimic_shape_full.pkl",
                         "--image_dir", png_dir]
            else:
                assert a.gold_csv, "--gold_csv or --scene_graph_dir " \
                    "required for real data"
                args += ["--gold_csv", a.gold_csv, "--image_dir", png_dir]
            if a.detector_init:
                args += ["--init_ckpt", a.detector_init,
                         "--norm", "frozen_bn", "--stride_in_1x1"]
            td.main(args)
            if a.vindr_csv or a.synthetic:
                args_d = ["--steps", str(a.detector_steps),
                          "--image_size", str(a.image_size),
                          "--ckpt_out", dis_ckpt, "--which", "disease"]
                if a.synthetic:
                    args_d += ["--synthetic", str(max(64, a.synthetic))]
                else:
                    args_d += ["--vindr_csv", a.vindr_csv,
                               "--image_dir", png_dir]
                td.main(args_d)
        else:
            print("[detector] skipped (exists)")

    if "extract" in stages:
        if a.force or not _exists(feats):
            from ekaid_tpu.extract import runner
            args = ["--out", feats, "--image_size", str(a.image_size)]
            if _exists(ana_ckpt):
                args += ["--ana_ckpt", ana_ckpt]
            if _exists(dis_ckpt):
                args += ["--dis_ckpt", dis_ckpt]
            if not (_exists(ana_ckpt) or _exists(dis_ckpt)):
                args += ["--allow_random"]
            if a.synthetic:
                args += ["--synthetic", str(a.synthetic)]
            else:
                args += ["--image_dir", png_dir]
            runner.main(args)
        else:
            print("[extract] skipped (exists)")

    if "preprocess" in stages and a.question_csv:
        if a.force or not _exists(npz):
            from ekaid_tpu.data.preprocess import transform_questions
            paths = transform_questions(a.question_csv, root)
            print(f"[preprocess] {paths}")
        else:
            print("[preprocess] skipped (exists)")

    if "train" in stages:
        from ekaid_tpu.train import train as trn
        args = ["--workdir", workdir,
                "--max_iter", str(a.train_iters),
                "--snapshot_interval",
                str(max(1, a.train_iters // 2))]
        if a.synthetic:
            args += ["--synthetic"]
        elif a.cfg:
            args += ["--cfg", a.cfg]
        trn.main(args)

    if "test" in stages:
        from ekaid_tpu.train import test as tst
        args = ["-p", os.path.join(workdir, "snapshots"),
                "--checkpoint", "best",
                "--out", os.path.join(workdir, "test_results.json")]
        if a.synthetic:
            args += ["--synthetic"]
        elif a.cfg:
            args += ["--cfg", a.cfg]
        tst.main(args)


def main(argv=None):
    from ekaid_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    p = argparse.ArgumentParser(
        description="EKAID-TPU end-to-end pipeline orchestrator")
    p.add_argument("--stage", default="all",
                   choices=("all",) + STAGES)
    p.add_argument("--data_root", default="./pipeline_data")
    p.add_argument("--synthetic", type=int, default=0,
                   help="run with N synthetic images (no real data)")
    p.add_argument("--image_dir", default=None)
    p.add_argument("--question_csv", default=None)
    p.add_argument("--gold_csv", default=None)
    p.add_argument("--scene_graph_dir", default=None,
                   help="silver ImaGenome scene-graph dir (anatomy)")
    p.add_argument("--shapes_pkl", default=None)
    p.add_argument("--detector_init", default=None,
                   help="converted reference detector params to "
                        "fine-tune from (torch_convert --kind detector)")
    p.add_argument("--vindr_csv", default=None)
    p.add_argument("--cfg", default=None)
    p.add_argument("--image_size", type=int, default=1024)
    p.add_argument("--detector_steps", type=int, default=2000)
    p.add_argument("--train_iters", type=int, default=40000)
    p.add_argument("--force", action="store_true")
    a = p.parse_args(argv)
    run_pipeline(a)


if __name__ == "__main__":
    main()
