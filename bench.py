"""Headline benchmark: 512x512 SD images/sec/chip WITH DAAM heatmaps on.

Runs the flagship generation path (full SD-1.x UNet, 20 PLMS steps, CFG,
fused per-token heatmap accumulation, VAE decode) on one chip with random
weights (throughput is weight-independent) and reports steady-state
images/sec/chip.

Baseline (BASELINE.json north star): 10,000 images/hour on a v5e-8
=> 0.3472 images/sec/chip. vs_baseline = ours / 0.3472.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import signal
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_IMG_PER_SEC_PER_CHIP = 10000.0 / 3600.0 / 8.0


def _watchdog(signum, frame):
    print("# bench watchdog: no result within BENCH_TIMEOUT — device/tunnel "
          "unresponsive, aborting instead of hanging", file=sys.stderr)
    os._exit(2)


def main():
    # The tunneled TPU backend can wedge (observed: compute hangs for >1h
    # after a failed remote compile); abort with a diagnostic instead of
    # hanging the driver's bench run forever.
    signal.signal(signal.SIGALRM, _watchdog)
    signal.alarm(int(os.environ.get("BENCH_TIMEOUT", "2700")))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from agenda_tpu.core.schedules import make_schedule
    from agenda_tpu.generate.pipeline import StableDiffusionPipeline
    from agenda_tpu.models import (
        AutoencoderKL,
        CLIPTextConfig,
        CLIPTextModel,
        UNet2DConditionModel,
        UNetConfig,
        VAEConfig,
    )

    batch = int(os.environ.get("BENCH_BATCH", "8"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    repeats = int(os.environ.get("BENCH_REPEATS", "5"))
    # TGATE gate step (arXiv:2404.02747), opt-in measurement knob. 0 (the
    # default, and what the driver runs) = the exact reference-parity
    # sampler; the headline metric never uses the approximation.
    tgate = int(os.environ.get("BENCH_TGATE", "0"))
    dtype = jnp.bfloat16

    from agenda_tpu.data.tokenizer import CLIPTokenizer

    from agenda_tpu.io.tiny_fixture import write_tiny_tokenizer
    import tempfile

    tok_dir = tempfile.mkdtemp(prefix="bench_tok_")
    write_tiny_tokenizer(tok_dir)
    tokenizer = CLIPTokenizer.from_pretrained(tok_dir)

    unet_cfg = UNetConfig()
    vae_cfg = VAEConfig()
    clip_cfg = CLIPTextConfig(vocab_size=len(tokenizer))

    unet = UNet2DConditionModel(unet_cfg, dtype=dtype)
    vae = AutoencoderKL(vae_cfg, dtype=dtype)
    text = CLIPTextModel(clip_cfg, dtype=dtype)

    # Random weights (shape-only): init via eval_shape + normal fill, bf16 to
    # halve HBM for the frozen inference path.
    def materialize(tree_shape, key):
        leaves, treedef = jax.tree_util.tree_flatten(tree_shape)
        keys = jax.random.split(key, len(leaves))
        vals = [
            jax.random.normal(k, l.shape, jnp.bfloat16) * 0.02 for k, l in zip(keys, leaves)
        ]
        return jax.tree_util.tree_unflatten(treedef, vals)

    k = jax.random.key(0)
    unet_params = materialize(
        jax.eval_shape(
            lambda: unet.init(k, jnp.zeros((1, 64, 64, 4)), jnp.array([1]),
                              jnp.zeros((1, 77, 768)))
        ),
        jax.random.key(1),
    )
    vae_params = materialize(
        jax.eval_shape(lambda: vae.init(k, jnp.zeros((1, 512, 512, 3)), k)),
        jax.random.key(2),
    )
    text_params = materialize(
        jax.eval_shape(lambda: text.init(k, jnp.ones((1, 77), jnp.int32))),
        jax.random.key(3),
    )
    pipe = StableDiffusionPipeline(
        unet=unet, unet_params=unet_params, vae=vae, vae_params=vae_params,
        text_encoder=text, text_params=text_params, tokenizer=tokenizer,
        schedule=make_schedule(), scheduler_type="pndm", latent_hw=64, dtype=dtype,
    )

    prompt = "an aerial view image with cars in utah"
    # Production path: per-word uint8 heatmaps computed on device (the
    # data_generation CLI flow).
    words = ["cars", "utah"]
    out_size = int(os.environ.get("BENCH_OUT", "112"))  # production artifact size
    # Warmup (compile)
    t0 = time.time()
    pipe(prompt, seeds=list(range(batch)), num_inference_steps=steps, words=words,
         out_size=out_size, tgate_step=tgate)
    compile_s = time.time() - t0

    # Steady-state pipelined throughput — the production loop shape
    # (cli/data_generation keeps one batch in flight via generate_async so
    # host materialization/PNG work overlaps device compute). Blocking after
    # every batch instead would bill the device->host transfer + dispatch
    # latency of this tunneled backend to every batch; the same effect
    # measured on the train step was ~15% (STATUS round-3 notes).
    pending = None
    times = []
    t0 = time.time()
    for r in range(repeats):
        cur = pipe.generate_async(prompt, seeds=list(range(r, r + batch)),
                                  num_inference_steps=steps, words=words,
                                  out_size=out_size, tgate_step=tgate)
        if pending is not None:
            pending()
            times.append(time.time() - t0 - sum(times))
        pending = cur
    pending()
    times.append(time.time() - t0 - sum(times))
    total = time.time() - t0
    img_per_sec = batch * repeats / total

    metric = "512px SD images/sec/chip with DAAM heatmaps (20-step PLMS, CFG)"
    if tgate:
        metric += f" [TGATE gate={tgate} — approximate, not the headline]"
    result = {
        "metric": metric,
        "value": round(img_per_sec, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_sec / BASELINE_IMG_PER_SEC_PER_CHIP, 3),
    }
    print(json.dumps(result))
    sys.stdout.flush()
    # Result is out — disarm the watchdog so slow teardown (e.g. a wedged
    # tunnel shutdown) can't turn a successful run into exit code 2.
    signal.alarm(0)
    print(
        f"# batch={batch} steps={steps} pipelined {total:.2f}s/{repeats} batches "
        f"({total / repeats:.2f}s/batch) compile={compile_s:.0f}s "
        f"times={['%.2f' % t for t in times]}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
