"""Extraction CLI: images → combined 52-node graph HDF5.

CLI parity with running ana_bbox_generator.py + bbox_generator_by_location
.py + combine_dicts.py back-to-back — one command, batched on the
accelerator, streaming host IO. Without trained detector checkpoints it
can run with random weights (--allow_random) for pipeline validation and
benchmarking.
"""

from __future__ import annotations

import argparse
import os
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ekaid_tpu.config import Config, default_config, load_config
from ekaid_tpu.extract.pipeline import Extractor, H5Writer
from ekaid_tpu.models.detector import FasterRCNN
from ekaid_tpu.utils.dtypes import Policy, canonical


def build_detector_fns(cfg: Config,
                       ana_params=None, dis_params=None,
                       rng: Optional[jax.Array] = None,
                       mesh=None):
    """Jitted (ana_apply, dis_apply) with given or random params.

    With `mesh` (a Mesh carrying a 'data' axis), extraction runs
    data-parallel via shard_map: each device processes batch/data
    images with replicated params (the reference is single-GPU
    batch-1; multi-chip extraction is green-field TPU design). The
    pallas ROIAlign requires shard_map — a tpu_custom_call does not
    auto-partition under plain GSPMD jit."""
    det = cfg.detector
    # resolve roi_backend='auto' here, once, against the live platform
    # (ADVICE r2: never inside module setup) — canvas on TPU, xla
    # elsewhere
    from ekaid_tpu.utils.platform import resolve_roi_backend
    det = det.replace(roi_backend=resolve_roi_backend(det.roi_backend))
    policy = Policy(compute_dtype=canonical(cfg.dtypes.compute_dtype))
    ana = FasterRCNN(det, num_classes=det.num_anatomy_classes,
                     norm=det.norm, stride_in_1x1=det.stride_in_1x1,
                     policy=policy)
    dis = FasterRCNN(det, num_classes=det.num_disease_classes,
                     norm=det.norm, stride_in_1x1=det.stride_in_1x1,
                     policy=policy)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, det.image_size, det.image_size, 3), jnp.float32)
    if ana_params is None:
        ana_params = ana.init(rng, dummy)
    if dis_params is None:
        dis_params = dis.init(jax.random.fold_in(rng, 1), dummy)
    # extraction is inference-only: pre-cast weights to the compute
    # dtype (same rounding as the per-use cast; halves HBM weight reads)
    from ekaid_tpu.utils.dtypes import cast_params_for_inference
    ana_params = cast_params_for_inference(ana_params, policy)
    dis_params = cast_params_for_inference(dis_params, policy)

    n_nodes = det.num_anatomy_classes

    def as_float(images):
        # uint8 batches normalize on-device (png_batches ships uint8 —
        # 4x less H2D than f32); float batches pass through. With
        # preprocess='detectron2' the caffe-BGR mean-sub transform
        # (torch_convert.detectron2_preprocess) also runs on-device —
        # REQUIRED for converted Detectron2 checkpoints.
        if images.dtype == jnp.uint8:
            images = images.astype(jnp.float32) / 255.0
        if getattr(det, "preprocess", "unit") == "detectron2":
            mean = jnp.asarray(det.pixel_mean, jnp.float32)
            std = jnp.asarray(det.pixel_std, jnp.float32)
            images = (images[..., ::-1] * 255.0 - mean) / std
        return images

    if mesh is not None:
        from jax.sharding import PartitionSpec as P
        try:
            from jax import shard_map            # jax >= 0.8
        except ImportError:                      # pragma: no cover
            from functools import partial as _partial
            from jax.experimental.shard_map import \
                shard_map as _legacy_shard_map

            def shard_map(f, *, check_vma=True, **kw):
                # the legacy API spells the flag check_rep
                return _legacy_shard_map(f, check_rep=check_vma, **kw)
        ndata = mesh.shape["data"]
        # replicate the weight trees onto the mesh ONCE — passing
        # single-device arrays would re-broadcast the full detector
        # params on every batch
        from jax.sharding import NamedSharding
        rep = NamedSharding(mesh, P())
        ana_params = jax.device_put(ana_params, rep)
        dis_params = jax.device_put(dis_params, rep)

        # check_vma off: the NMS while_loop carry starts from literal
        # constants (unvarying) and becomes data-varying — sound here,
        # since no cross-shard collectives exist in the detector
        jana = jax.jit(shard_map(
            lambda p, im: ana.apply(p, as_float(im), method="extract"),
            mesh=mesh, in_specs=(P(), P("data")), out_specs=P("data"),
            check_vma=False))
        jdis = jax.jit(shard_map(
            lambda p, im: dis.apply(p, as_float(im), method="detect",
                                    max_out=n_nodes),
            mesh=mesh, in_specs=(P(), P("data")), out_specs=P("data"),
            check_vma=False))

        def ana_apply(images):
            assert images.shape[0] % ndata == 0, (
                f"batch {images.shape[0]} must divide data axis {ndata}")
            return jana(ana_params, images)

        def dis_apply(images):
            assert images.shape[0] % ndata == 0, (
                f"batch {images.shape[0]} must divide data axis {ndata}")
            return jdis(dis_params, images)

        return ana_apply, dis_apply

    @jax.jit
    def ana_apply(images):
        return ana.apply(ana_params, as_float(images), method="extract")

    @jax.jit
    def dis_apply(images):
        return dis.apply(dis_params, as_float(images), method="detect",
                         max_out=n_nodes)

    return ana_apply, dis_apply


def list_images(image_dir: str,
                shard: Optional[tuple] = None) -> list:
    """Sorted image files, optionally strided to shard k of n."""
    files = sorted(f for f in os.listdir(image_dir)
                   if f.lower().endswith((".png", ".jpg", ".jpeg")))
    if shard is not None:
        k, n = shard
        files = files[k::n]
    return files


def png_batches(image_dir: str, image_size: int, batch_size: int,
                workers: Optional[int] = None, prefetch: int = 4,
                skip: int = 0,
                shard: Optional[tuple] = None) -> Iterator[np.ndarray]:
    """Host image loader: PNG/JPG files → [B, S, S, 3] uint8 batches.
    (converter.py:71 resizes MIMIC to 1024² PNG upstream.)

    Decodes on a thread pool with a bounded in-order window. Sequential
    1024² PNG decode measures ~55 img/s (12.8 ms zlib + 2.9 ms
    RGB/asarray) — slower than the ~120 img/s the chip extracts at
    batch 8, so a sequential loader is the END-TO-END bottleneck. The
    window keeps decoding while the consumer blocks on device fetches
    (overlap even on 1 CPU); multi-core TPU hosts additionally scale
    the decode itself (this container has os.cpu_count()==1, where
    threads gave only 1.1-1.2x — I/O overlap, no parallel zlib).
    Workers touch only PIL/numpy, never JAX (CLAUDE.md convention)."""
    from PIL import Image
    files = list_images(image_dir, shard)
    if skip:
        # resume: committed rows in the output HDF5 correspond 1:1 to
        # the leading files in this (sharded) sorted order — the writer
        # trims tail-batch zero-pad rows on close so the count is real
        # images only (main() also clamps a pre-trim crash)
        files = files[skip:]
    if workers is None:
        workers = min(8, os.cpu_count() or 1)

    def load(f):
        img = Image.open(os.path.join(image_dir, f)).convert("RGB")
        if img.size != (image_size, image_size):
            img = img.resize((image_size, image_size))
        # ship uint8: 4x less host->device traffic than f32; the
        # jitted apply normalizes on-device (build_detector_fns)
        return np.asarray(img, np.uint8)

    def results():
        if workers <= 1:
            for f in files:
                yield load(f)
            return
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(workers) as ex:
            pending: deque = deque()
            fit = iter(files)

            def fill():
                while len(pending) < workers * prefetch:
                    f = next(fit, None)
                    if f is None:
                        return
                    pending.append(ex.submit(load, f))

            fill()
            while pending:                   # in submit (sorted) order
                arr = pending.popleft().result()
                fill()
                yield arr

    batch = []
    for arr in results():
        batch.append(arr)
        if len(batch) == batch_size:
            yield np.stack(batch)
            batch = []
    if batch:
        # pad the tail to keep the jit shape static
        while len(batch) < batch_size:
            batch.append(np.zeros_like(batch[0]))
        yield np.stack(batch)


def synthetic_batches(n: int, image_size: int, batch_size: int,
                      skip: int = 0) -> Iterator[np.ndarray]:
    rng = np.random.default_rng(0)
    for i in range(n // batch_size):
        batch = rng.standard_normal(
            (batch_size, image_size, image_size, 3)).astype(np.float32)
        if i * batch_size >= skip:    # resume: same stream, same images
            yield batch


def main(argv=None):
    from ekaid_tpu.utils.platform import (apply_platform_env,
                                            enable_compile_cache)
    apply_platform_env()
    enable_compile_cache()   # axon remote compiles take minutes
    p = argparse.ArgumentParser(description="CXR feature extraction")
    p.add_argument("--cfg", default=None)
    p.add_argument("--image_dir", default=None)
    p.add_argument("--synthetic", type=int, default=0,
                   help="run N synthetic images instead of reading files")
    p.add_argument("--out", default="data/cmb_bbox_di_feats.hdf5")
    p.add_argument("--ana_ckpt", default=None)
    p.add_argument("--dis_ckpt", default=None)
    p.add_argument("--allow_random", action="store_true")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--image_size", type=int, default=None)
    p.add_argument("--norm", default=None, choices=["gn", "frozen_bn"],
                   help="backbone norm; use frozen_bn (+--stride_in_1x1)"
                        " for converted Detectron2 checkpoints")
    p.add_argument("--stride_in_1x1", action="store_true")
    p.add_argument("--preprocess", default=None,
                   choices=["unit", "detectron2"],
                   help="on-device input normalization; detectron2 = "
                        "caffe-BGR mean-sub for converted checkpoints")
    p.add_argument("--store_dtype", default="float32",
                   choices=["float32", "float16"],
                   help="image_features storage dtype; float16 halves "
                        "the store/loader/H2D bytes (the model casts "
                        "inputs to bf16 at entry anyway)")
    p.add_argument("--io_workers", type=int, default=None,
                   help="PNG decode threads (default min(8, cpus))")
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel extraction over N devices "
                        "(0 = single device)")
    p.add_argument("--shard", default=None, metavar="K/N",
                   help="process every N-th image starting at K "
                        "(0-based) — split a big extraction across N "
                        "machines, each writing its own --out; composes "
                        "with --resume (the skip applies within this "
                        "shard's file list)")
    p.add_argument("--resume", action="store_true",
                   help="append to an existing --out: keeps its rows "
                        "(after truncating a mid-append crash to the "
                        "shortest dataset) and skips the corresponding "
                        "leading images (the reference's crash recovery "
                        "is a HAND-ENTERED stopped_batch_num, "
                        "ana_bbox_generator.py:549-562; here the "
                        "restart point is read from the file)")
    a = p.parse_args(argv)

    # validate cheap argv combinations BEFORE any checkpoint restore /
    # jit setup / output-file truncation
    shard = None
    if a.shard:
        try:
            k, n = (int(x) for x in a.shard.split("/"))
        except ValueError:
            raise SystemExit(f"--shard {a.shard!r}: expected K/N")
        if not 0 <= k < n:
            raise SystemExit(f"--shard {a.shard}: need 0 <= K < N")
        shard = (k, n)
        if a.synthetic:
            raise SystemExit("--shard applies to --image_dir runs")
    if not a.synthetic and not a.image_dir:
        raise SystemExit("--image_dir or --synthetic required")

    cfg = load_config(a.cfg) if a.cfg else default_config()
    det = cfg.detector
    if a.image_size:
        det = det.replace(image_size=a.image_size)
    if a.batch_size:
        det = det.replace(extract_batch_size=a.batch_size)
    if a.norm:
        det = det.replace(norm=a.norm)
    if a.stride_in_1x1:
        det = det.replace(stride_in_1x1=True)
    if a.preprocess:
        det = det.replace(preprocess=a.preprocess)
    cfg = cfg.replace(detector=det)

    ana_params = dis_params = None
    if a.ana_ckpt or a.dis_ckpt:
        import orbax.checkpoint as ocp
        ck = ocp.StandardCheckpointer()
        if a.ana_ckpt:
            ana_params = ck.restore(os.path.abspath(a.ana_ckpt))
        if a.dis_ckpt:
            dis_params = ck.restore(os.path.abspath(a.dis_ckpt))
    elif not a.allow_random:
        raise SystemExit("no checkpoints given; pass --allow_random to "
                         "run with random detector weights")

    mesh = None
    if a.dp:
        from ekaid_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(data=a.dp, model=1,
                         devices=jax.devices()[:a.dp])
        if det.extract_batch_size % a.dp:
            nb = max(a.dp, det.extract_batch_size // a.dp * a.dp)
            print(f"note: batch_size {det.extract_batch_size} -> {nb} "
                  f"to divide --dp {a.dp}")
            det = det.replace(extract_batch_size=nb)
            cfg = cfg.replace(detector=det)
    ana_apply, dis_apply = build_detector_fns(cfg, ana_params, dis_params,
                                              mesh=mesh)
    ex = Extractor(ana_apply, dis_apply, det.num_disease_classes)
    run_meta = {"shard": a.shard or "",
                "image_dir": os.path.abspath(a.image_dir)
                if a.image_dir else "",
                "synthetic": int(a.synthetic),
                "ana_ckpt": a.ana_ckpt or "", "dis_ckpt": a.dis_ckpt or "",
                "norm": det.norm, "preprocess": det.preprocess,
                "image_size": det.image_size}
    writer = H5Writer(a.out, num_nodes=2 * det.num_anatomy_classes,
                      feat_dim=det.roi_feat_dim,
                      feat_dtype=a.store_dtype,
                      mode="a" if a.resume else "w", run_meta=run_meta)
    done = writer.n
    if a.synthetic:
        if done % det.extract_batch_size:
            raise SystemExit(
                f"synthetic resume needs committed rows ({done}) to be "
                f"a multiple of the batch size "
                f"({det.extract_batch_size}) — rerun with the original "
                f"batch size")
        if done:
            print(f"resuming: {done} images already in {a.out}")
        batches = synthetic_batches(a.synthetic, det.image_size,
                                    det.extract_batch_size, skip=done)
    else:
        total = len(list_images(a.image_dir, shard))
        if done > total:
            # a crash between the final padded append and the close()
            # trim left pad rows committed; drop them before resuming
            writer.truncate(total)
            done = total
        if done:
            print(f"resuming: {done}/{total} images already in {a.out}")
        # close() trims the tail batch's zero-pad records back to the
        # real image count, keeping rows 1:1 with files for any later
        # --resume (and for downstream consumers)
        writer.expected_rows = total
        batches = png_batches(a.image_dir, det.image_size,
                              det.extract_batch_size,
                              workers=a.io_workers, skip=done,
                              shard=shard)
    ex.run(batches, writer)
    print(f"wrote {a.out}")


if __name__ == "__main__":
    main()
