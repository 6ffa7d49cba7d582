"""Detector training driver (train_anatomy.py / train-vindr-online.py parity).

The reference fine-tunes Detectron2 Faster R-CNN with SGD + warmup
(train_anatomy.py:561-586) and, for VinDr, albumentations augmentation
(HorizontalFlip / ShiftScaleRotate / RandomBrightnessContrast,
train-vindr-online.py:268-283) with WarmupCosineLR and a validation
AP@0.5 hook (mytrainer.py:11-43, evaluator.py:40-41).

Here: one jitted donated train step over the device mesh, host-side
numpy augmentation (flip / shift-scale-ROTATE / brightness-contrast —
the same three transforms with the reference's parameters, box-aware
rotation via the corner-hull rule), optax warmup-cosine, and the native
DetectionEvaluator. Datasets are (image, boxes, classes, valid) tuples;
a COCO-style JSON loader and a synthetic-blob dataset are provided.
"""

from __future__ import annotations

import argparse
import time
from typing import Dict, Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ekaid_tpu.config import Config, default_config, load_config
from ekaid_tpu.metrics.detection import DetectionEvaluator
from ekaid_tpu.models.detector import FasterRCNN
from ekaid_tpu.utils.dtypes import Policy, canonical


# ------------------------------------------------------------- datasets ---

def synthetic_blob_dataset(n_images: int, image_size: int,
                           num_classes: int, max_gt: int = 8, seed: int = 0):
    """Class-k blobs at random locations; returns arrays
    (images [N,S,S,3], boxes [N,G,4], classes [N,G], valid [N,G])."""
    rng = np.random.default_rng(seed)
    images = rng.normal(0, 0.05, (n_images, image_size, image_size, 3)
                        ).astype(np.float32)
    boxes = np.zeros((n_images, max_gt, 4), np.float32)
    classes = np.zeros((n_images, max_gt), np.int32)
    valid = np.zeros((n_images, max_gt), bool)
    for i in range(n_images):
        g = rng.integers(1, max_gt)
        for j in range(g):
            w = rng.uniform(image_size * 0.15, image_size * 0.45)
            h = rng.uniform(image_size * 0.15, image_size * 0.45)
            x1 = rng.uniform(0, image_size - w)
            y1 = rng.uniform(0, image_size - h)
            c = rng.integers(0, num_classes)
            boxes[i, j] = (x1, y1, x1 + w, y1 + h)
            classes[i, j] = c
            valid[i, j] = True
            images[i, int(y1):int(y1 + h), int(x1):int(x1 + w),
                   c % 3] += 0.5 + 0.2 * (c // 3)
    return images, boxes, classes, valid


def affine_warp(img: np.ndarray, boxes: np.ndarray, angle_deg: float,
                scale: float, dx: float, dy: float, image_size: int):
    """One shift-scale-rotate about the image center with bilinear
    resampling (zero fill) + box corner transform (the rotated box's
    axis-aligned hull, albumentations bbox_shift_scale_rotate
    semantics). img [S, S, C]; boxes [G, 4] xyxy."""
    a = np.deg2rad(angle_deg)
    cos, sin = np.cos(a), np.sin(a)
    c = (image_size - 1) / 2.0

    # inverse map for sampling: src = R^-1((dst - c - t)) / s + c
    ys, xs = np.mgrid[0:image_size, 0:image_size].astype(np.float32)
    u = xs - c - dx
    v = ys - c - dy
    xsrc = (cos * u + sin * v) / scale + c
    ysrc = (-sin * u + cos * v) / scale + c
    x0 = np.floor(xsrc).astype(np.int64)
    y0 = np.floor(ysrc).astype(np.int64)
    fx = (xsrc - x0)[..., None]
    fy = (ysrc - y0)[..., None]

    def tap(yy, xx):
        inb = (yy >= 0) & (yy < image_size) & (xx >= 0) & (xx < image_size)
        val = img[np.clip(yy, 0, image_size - 1),
                  np.clip(xx, 0, image_size - 1)]
        return val * inb[..., None]

    out = ((1 - fy) * ((1 - fx) * tap(y0, x0) + fx * tap(y0, x0 + 1))
           + fy * ((1 - fx) * tap(y0 + 1, x0) + fx * tap(y0 + 1, x0 + 1)))

    # forward-map the 4 corners, take the axis-aligned hull
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    cx = np.stack([x1, x2, x1, x2], axis=1) - c       # [G, 4]
    cy = np.stack([y1, y1, y2, y2], axis=1) - c
    nx = scale * (cos * cx - sin * cy) + c + dx
    ny = scale * (sin * cx + cos * cy) + c + dy
    new_boxes = np.stack([nx.min(1), ny.min(1), nx.max(1), ny.max(1)],
                         axis=1)
    return out.astype(img.dtype), np.clip(new_boxes, 0, image_size)


def augment(images, boxes, rng, image_size: int,
            flip_p: float = 0.5, shift_limit: float = 0.0625,
            scale_limit: float = 0.15, rotate_limit: float = 10.0,
            ssr_p: float = 0.5, brightness: float = 0.2):
    """Host-side box-aware augmentation (train-vindr-online.py:268-283
    transform set + parameters: HorizontalFlip p=0.5,
    ShiftScaleRotate(scale_limit=0.15, rotate_limit=10, p=0.5),
    RandomBrightnessContrast p=0.5)."""
    out_i = images.copy()
    out_b = boxes.copy()
    b = images.shape[0]
    for i in range(b):
        if rng.random() < flip_p:
            out_i[i] = out_i[i, :, ::-1]
            x1 = image_size - out_b[i, :, 2]
            x2 = image_size - out_b[i, :, 0]
            out_b[i, :, 0], out_b[i, :, 2] = x1, x2
        if rng.random() < ssr_p:
            out_i[i], out_b[i] = affine_warp(
                out_i[i], out_b[i],
                angle_deg=rng.uniform(-rotate_limit, rotate_limit),
                scale=1.0 + rng.uniform(-scale_limit, scale_limit),
                dx=rng.uniform(-shift_limit, shift_limit) * image_size,
                dy=rng.uniform(-shift_limit, shift_limit) * image_size,
                image_size=image_size)
        if rng.random() < 0.5:
            out_i[i] = (out_i[i]
                        * rng.uniform(1 - brightness, 1 + brightness)
                        + rng.uniform(-brightness, brightness) * 0.1)
    return out_i, out_b


def batches(arrays, batch_size: int, shuffle: bool, seed: int,
            augment_fn=None) -> Iterator[Tuple]:
    images, boxes, classes, valid = arrays
    n = len(images)
    order = np.arange(n)
    rng = np.random.default_rng(seed)
    if shuffle:
        rng.shuffle(order)
    for i in range(n // batch_size):
        idx = order[i * batch_size:(i + 1) * batch_size]
        im, bx = images[idx], boxes[idx]
        if augment_fn is not None:
            im, bx = augment_fn(im, bx, rng)
        yield im, bx, classes[idx], valid[idx]


# ---------------------------------------------------------------- train ---

class DetectorTrainer:
    def __init__(self, cfg: Config, num_classes: int,
                 total_steps: int = 1000, lr: float = 1e-3,
                 warmup: int = 100, augment_data: bool = True,
                 norm: str = "gn", stride_in_1x1: bool = False):
        """norm/stride_in_1x1: pass ('frozen_bn', True) to fine-tune
        from converted Detectron2 weights (torch_convert) — the
        reference always initializes from prior weights
        (cfg.MODEL.WEIGHTS, train_anatomy.py:563-568)."""
        self.cfg = cfg
        det = cfg.detector
        policy = Policy(compute_dtype=canonical(cfg.dtypes.compute_dtype))
        self.model = FasterRCNN(det, num_classes=num_classes,
                                norm=norm, stride_in_1x1=stride_in_1x1,
                                policy=policy)
        self.num_classes = num_classes
        self.augment_data = augment_data

        warmup = min(warmup, max(1, total_steps // 10))
        sched = optax.warmup_cosine_decay_schedule(
            0.0, lr, warmup, total_steps)
        self.tx = optax.chain(optax.clip_by_global_norm(10.0),
                              optax.adamw(sched, weight_decay=1e-4))
        dummy = jnp.zeros((det.batch_size, det.image_size, det.image_size,
                           3), jnp.float32)
        self.params = self.model.init(jax.random.PRNGKey(0), dummy)
        self.opt_state = self.tx.init(self.params)

        model, tx = self.model, self.tx

        @jax.jit
        def train_step(params, opt_state, images, gb, gc, gv, rng):
            def loss_fn(p):
                losses = model.apply(p, images, gb, gc, gv, rng,
                                     method="losses")
                return losses["total"], losses

            (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, aux

        @jax.jit
        def detect_step(params, images):
            return model.apply(params, images, method="detect",
                               max_out=100)

        self._train_step = train_step
        self._detect = detect_step

    def fit(self, arrays, steps: int, log_every: int = 50,
            seed: int = 0) -> Dict[str, float]:
        det = self.cfg.detector
        rng = jax.random.PRNGKey(seed)
        aug = ((lambda im, bx, r: augment(im, bx, r, det.image_size))
               if self.augment_data else None)
        t = 0
        epoch = 0
        last = {}
        t0 = time.time()
        while t < steps:
            for im, bx, cl, vl in batches(arrays, det.batch_size,
                                          shuffle=True,
                                          seed=seed + epoch,
                                          augment_fn=aug):
                rng, r = jax.random.split(rng)
                self.params, self.opt_state, aux = self._train_step(
                    self.params, self.opt_state, jnp.asarray(im),
                    jnp.asarray(bx), jnp.asarray(cl), jnp.asarray(vl), r)
                t += 1
                if t % log_every == 0:
                    last = {k: float(v) for k, v in aux.items()}
                    rate = t * det.batch_size / (time.time() - t0)
                    print(f"step {t} "
                          + " ".join(f"{k}={v:.4f}"
                                     for k, v in last.items())
                          + f" img/s={rate:.1f}")
                if t >= steps:
                    break
            epoch += 1
        return last

    def validation_loss(self, arrays, rng_seed: int = 0
                        ) -> Dict[str, float]:
        """Mean loss over a validation set without updating
        (LossEvalHook parity, evaluator.py:697-758 wired via
        mytrainer.py:32-42)."""
        det = self.cfg.detector
        model = self.model
        if not hasattr(self, "_val_loss_step"):
            @jax.jit
            def val_loss(params, images, gb, gc, gv, rng):
                return model.apply(params, images, gb, gc, gv, rng,
                                   method="losses")
            self._val_loss_step = val_loss
        rng = jax.random.PRNGKey(rng_seed)
        sums: Dict[str, float] = {}
        n = 0
        for im, bx, cl, vl in batches(arrays, det.batch_size,
                                      shuffle=False, seed=0):
            rng, r = jax.random.split(rng)
            losses = self._val_loss_step(
                self.params, jnp.asarray(im), jnp.asarray(bx),
                jnp.asarray(cl), jnp.asarray(vl), r)
            for k, v in losses.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            n += 1
        return {f"val_{k}": v / max(n, 1) for k, v in sums.items()}

    def evaluate(self, arrays, proposals: bool = False
                 ) -> Dict[str, float]:
        """AP@0.5 over a dataset (VinbigdataEvaluator surface);
        `proposals=True` adds class-agnostic AR@100 over the detections
        (the inherited proposal-mode evaluation, evaluator.py:462)."""
        from ekaid_tpu.metrics.detection import proposal_recall
        det = self.cfg.detector
        ev = DetectionEvaluator(self.num_classes)
        prop_acc = {"p": [], "s": [], "v": [], "gb": [], "gv": []}
        for im, bx, cl, vl in batches(arrays, det.batch_size,
                                      shuffle=False, seed=0):
            out = self._detect(self.params, jnp.asarray(im))
            for b in range(im.shape[0]):
                ev.add_image(out["boxes"][b], out["classes"][b],
                             out["scores"][b], out["valid"][b],
                             bx[b], cl[b], vl[b])
                if proposals:
                    prop_acc["p"].append(np.asarray(out["boxes"][b]))
                    prop_acc["s"].append(np.asarray(out["scores"][b]))
                    prop_acc["v"].append(np.asarray(out["valid"][b]))
                    prop_acc["gb"].append(bx[b])
                    prop_acc["gv"].append(vl[b])
        scores = ev.summarize()
        if proposals and prop_acc["p"]:
            scores.update(proposal_recall(
                prop_acc["p"], prop_acc["s"], prop_acc["v"],
                prop_acc["gb"], prop_acc["gv"], limits=(100,)))
        return scores


def main(argv=None):
    from ekaid_tpu.utils.platform import (apply_platform_env,
                                            enable_compile_cache)
    apply_platform_env()
    enable_compile_cache()   # axon remote compiles take minutes
    p = argparse.ArgumentParser(description="EKAID-TPU detector training")
    p.add_argument("--cfg", default=None)
    p.add_argument("--which", default="anatomy",
                   choices=["anatomy", "disease"])
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--image_size", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--no_augment", action="store_true")
    p.add_argument("--init_ckpt", default=None,
                   help="orbax params dir to fine-tune from (a prior "
                        "--ckpt_out or a converted reference detector; "
                        "cfg.MODEL.WEIGHTS parity)")
    p.add_argument("--norm", default="gn", choices=["gn", "frozen_bn"])
    p.add_argument("--stride_in_1x1", action="store_true",
                   help="caffe stride placement (converted Detectron2 "
                        "checkpoints)")
    p.add_argument("--ckpt_out", default=None)
    p.add_argument("--gold_csv", default=None,
                   help="Chest ImaGenome gold bbox CSV (anatomy)")
    p.add_argument("--scene_graph_dir", default=None,
                   help="Chest ImaGenome silver scene-graph JSON dir "
                        "(anatomy, the reference's primary data path)")
    p.add_argument("--shapes_pkl", default=None,
                   help="mimic_shape_full.pkl-style original-shape map "
                        "(required with --scene_graph_dir)")
    p.add_argument("--vindr_csv", default=None,
                   help="VinDr-CXR annotations CSV (disease)")
    p.add_argument("--image_dir", default=None)
    a = p.parse_args(argv)

    cfg = load_config(a.cfg) if a.cfg else default_config()
    det = cfg.detector
    if a.image_size:
        det = det.replace(image_size=a.image_size)
    if a.batch_size:
        det = det.replace(batch_size=a.batch_size)
    cfg = cfg.replace(detector=det)
    k = (det.num_anatomy_classes if a.which == "anatomy"
         else det.num_disease_classes)

    trainer = DetectorTrainer(cfg, k, total_steps=a.steps, lr=a.lr,
                              augment_data=not a.no_augment,
                              norm=a.norm, stride_in_1x1=a.stride_in_1x1)
    if a.init_ckpt:
        import orbax.checkpoint as ocp
        import os as _os
        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(_os.path.abspath(a.init_ckpt),
                                 trainer.params)
        trainer.params = restored
        trainer.opt_state = trainer.tx.init(trainer.params)
        print(f"initialized from {a.init_ckpt}")
    if a.synthetic:
        arrays = synthetic_blob_dataset(a.synthetic, det.image_size, k)
    elif a.gold_csv or a.vindr_csv or a.scene_graph_dir:
        from ekaid_tpu.data.detection import (ImageBoxDataset,
                                              load_imagenome_gold,
                                              load_imagenome_silver,
                                              load_shapes, load_vindr)
        assert a.image_dir, "--image_dir required with annotations"
        if a.scene_graph_dir:
            assert a.shapes_pkl, "--shapes_pkl required with silver " \
                "scene graphs (boxes live in the 224-pad frame)"
            names, boxes, classes, valid = load_imagenome_silver(
                a.scene_graph_dir, load_shapes(a.shapes_pkl),
                image_size=det.image_size)
        else:
            loader = (load_imagenome_gold if a.gold_csv else load_vindr)
            names, boxes, classes, valid = loader(
                a.gold_csv or a.vindr_csv, image_size=det.image_size)
        ds = ImageBoxDataset(names, boxes, classes, valid, a.image_dir,
                             det.image_size)
        arrays = ds.materialize()
        print(f"loaded {len(names)} annotated images")
    else:
        raise SystemExit("pass --synthetic N or an annotation source")
    trainer.fit(arrays, a.steps)
    scores = trainer.evaluate(arrays)
    print({m: round(v, 4) for m, v in scores.items()
           if not m.startswith("AP50-")})
    print("AP50:", scores["AP50"])
    if a.ckpt_out:
        import orbax.checkpoint as ocp
        import os
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(a.ckpt_out), trainer.params,
                   force=True)
        ckptr.wait_until_finished()     # async write must land pre-exit
        print("saved", a.ckpt_out)


if __name__ == "__main__":
    main()
