"""Serving-artifact A/B: live-compile startup vs pre-compiled artifact.

What a fresh serving host pays today is the decode compile — minutes
through the axon remote-compile service (memory: axon-tpu-quirks); the
persistent compile cache only helps on the same host fingerprint. The
artifact (serving/artifact.py) ships the compiled executable itself.

Measures at flagship dims, batch 1, on the live platform:
    compile_s     jit(decode).lower().compile() wall-clock with the
                  persistent compile cache DISABLED (fresh-host cost)
    export_s      save_artifact() (producer-side cost, one-off)
    load_s        load_artifact() wall-clock
    first_call_s  first decode through the loaded executable
    agree         loaded-executable answer tokens == live decode's

Prints one JSON line per run (run_tpu_queue.sh collects them).
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from ekaid_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

import jax                                                # noqa: E402

# honest fresh-host compile cost: no persistent cache
jax.config.update("jax_enable_compilation_cache", False)

import jax.numpy as jnp                                   # noqa: E402
import numpy as np                                        # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--cfg", default=None,
                   help="config YAML (configs/smoke.yaml for CPU smokes)")
    a = p.parse_args()

    from ekaid_tpu.config import default_config, load_config
    from ekaid_tpu.data.synthetic import synthetic_batch
    from ekaid_tpu.models.ekaid import EkaidModel
    from ekaid_tpu.serving.artifact import (load_artifact, save_artifact,
                                            _decode_fn)
    from ekaid_tpu.utils.dtypes import (Policy, canonical,
                                        cast_params_for_inference)

    cfg = load_config(a.cfg) if a.cfg else default_config()
    policy = Policy(compute_dtype=canonical(cfg.dtypes.compute_dtype))
    model = EkaidModel(cfg, ntoken=147, policy=policy)
    batch = jax.tree.map(jnp.asarray, synthetic_batch(cfg, a.batch, seed=0))
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)},
                        batch, train=True)
    params = cast_params_for_inference(params, policy)

    decode = _decode_fn(model)
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype),
        (params, batch))

    t0 = time.time()
    compiled = jax.jit(decode).lower(*abstract).compile()
    compile_s = time.time() - t0
    live_seq = np.asarray(compiled(params, batch)["seq"])

    sample = {k: np.asarray(v[0]) for k, v in batch.items()}
    art_dir = os.path.join(tempfile.mkdtemp(prefix="ekaid_art_"), "art")
    t0 = time.time()
    try:
        save_artifact(art_dir, model, params, sample,
                      batch_sizes=(a.batch,))
    except Exception as e:
        # an experimental backend may not support executable
        # serialization — record the fact as a result, not a crash
        print(json.dumps({
            "bench": "artifact_startup",
            "platform": jax.default_backend(),
            "compile_s": round(compile_s, 2),
            "export_error": f"{type(e).__name__}: {e}"[:200],
        }))
        return
    export_s = time.time() - t0

    t0 = time.time()
    art = load_artifact(art_dir)
    load_s = time.time() - t0
    t0 = time.time()
    got = np.asarray(art.fn_for_batch(a.batch)(art.params, batch)["seq"])
    first_call_s = time.time() - t0

    print(json.dumps({
        "bench": "artifact_startup",
        "platform": jax.default_backend(),
        "batch": a.batch,
        "compile_s": round(compile_s, 2),
        "export_s": round(export_s, 2),
        "load_s": round(load_s, 2),
        "first_call_s": round(first_call_s, 2),
        "agree": bool((got == live_seq).all()),
    }))


if __name__ == "__main__":
    main()
