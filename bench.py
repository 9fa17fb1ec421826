"""Headline benchmark: 512x512 SD images+PSEUDO-LABELS/sec/chip.

Runs the full production chain on one chip — the north-star metric is
"10,000 512-px images/hour WITH heatmaps + pseudo-labels" (BASELINE.md:47),
so the headline composes every stage, not just generation:

  1. generate: full SD-1.x UNet, 20 PLMS steps, CFG, fused per-token DAAM
     heatmap accumulation, VAE decode, on-device 512->112 resize
     (data_generation/data_generation.py:56-86);
  2. stack: 3 per-word heatmaps -> RGB heatmap image, R=object G=fg
     B=inverted-bg (postprocess_heatmap.py:36-50);
  3. label: yolov8 predict on the 112-px stacks at the detector's 128-px
     img_scale with the on-device u8 resize (mmdet tools/test.py role);
  4. pseudo-COCO: score filter + edge completion + fake 42.36-px boxes
     (ConvertPredToCOCOPseudoAnnotations.ipynb cells 4-7).

Random weights throughout (throughput is weight-independent). Stages 1+3
run pipelined exactly like the production CLIs (one batch in flight).

Baseline (BASELINE.json north star): 10,000 images/hour on a v5e-8
=> 0.3472 images/sec/chip. vs_baseline = ours / 0.3472.

BENCH_GEN_ONLY=1 reverts to the round-3 generation-only metric.

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
    # Production heatmap set: object word + fg token + bg token (the stack
    # postprocessor consumes exactly 3 maps, postprocess_heatmap.py:44-46).
    words = ["cars", "aerial", "utah"]
    out_size = int(os.environ.get("BENCH_OUT", "112"))  # production artifact size
    gen_only = bool(int(os.environ.get("BENCH_GEN_ONLY", "0")))

    # -- stage 3 setup: yolov8 labeler at the reference geometry (128-px
    # img_scale over 112-px stacks — Synthetic_Heatmap/yolov8.py) with the
    # runner's on-device u8 resize (detect/runner.py predict_u8).
    if not gen_only:
        from agenda_tpu.data.device_resize import resize_weights
        from agenda_tpu.detect.families import build_family

        fam = build_family("yolov8", model=dict(img_size=128, max_gt=64))
        det_vars = fam.init_variables(jax.random.key(7))
        w112 = jnp.asarray(resize_weights(out_size, 128, "bilinear"))

        @jax.jit
        def label_u8(variables, u8):
            x = u8.astype(jnp.float32)
            x = jnp.einsum("Ww,bhwc->bhWc", w112, x)
            x = jnp.einsum("Hh,bhwc->bHwc", w112, x)
            x = jnp.round(jnp.clip(x, 0.0, 255.0)) / 255.0
            return fam.predict_fn(variables, x)

    from PIL import Image

    def stack_maps(word_maps, j):
        # postprocess_heatmap.py: R=object map, G=fg map, B=255-bg map,
        # each 64->112 via PIL like the generation CLI's heatmap writer.
        chans = []
        for wi, word in enumerate(words):
            m = np.asarray(Image.fromarray(word_maps[word][j]).resize(
                (out_size, out_size)))
            chans.append(255 - m if wi == 2 else m)
        return np.stack(chans, axis=-1).astype(np.uint8)

    # Warmup (compile): generation + labeling programs.
    t0 = time.time()
    _imgs, _maps = pipe(prompt, seeds=list(range(batch)), num_inference_steps=steps,
                        words=words, out_size=out_size, tgate_step=tgate)
    if not gen_only:
        _stk = np.stack([stack_maps(_maps, j) for j in range(batch)])
        jax.block_until_ready(label_u8(det_vars, jnp.asarray(_stk)))
    compile_s = time.time() - t0

    # Steady-state pipelined throughput — the production loop shape
    # (cli/data_generation keeps one batch in flight via generate_async so
    # host materialization/PNG work overlaps device compute; labeling for
    # batch i dispatches while batch i+1 generates). Blocking after every
    # batch instead would bill the device->host transfer + dispatch latency
    # of this tunneled backend to every batch; the same effect measured on
    # the train step was ~15% (STATUS round-3 notes).
    pending = None          # generation thunk for the in-flight batch
    pending_label = None    # labeling futures for the previous batch
    records = []
    stage = {"gen_wait": 0.0, "stack_host": 0.0, "label_wait": 0.0,
             "pseudo_coco": 0.0}
    times = []

    def collect_label(fut):
        t = time.time()
        boxes, scores, valid = jax.device_get(fut)
        stage["label_wait"] += time.time() - t
        sb = out_size / 128.0  # scale detector coords back to 112 px
        for k in range(len(boxes)):
            # Random detector weights emit ~55 boxes/img at score ~0.01; the
            # cutoffs are set BELOW that so every box flows through the
            # stage-4 per-box edge-completion math (a trained detector at the
            # production F1-max threshold passes ~1-10 boxes/img — this is
            # the conservative side).
            keep = valid[k] & (scores[k] > 0.005)
            records.append({
                "img_path": f"/bench/{len(records)}.png",
                "pred_instances": {
                    "bboxes": boxes[k][keep] * sb,
                    "scores": scores[k][keep],
                    "labels": np.zeros(int(keep.sum()), np.int64),
                },
            })

    t0 = time.time()
    for r in range(repeats):
        cur = pipe.generate_async(prompt, seeds=list(range(r, r + batch)),
                                  num_inference_steps=steps, words=words,
                                  out_size=out_size, tgate_step=tgate)
        if pending is not None:
            t = time.time()
            imgs, wmaps = pending()
            stage["gen_wait"] += time.time() - t
            if not gen_only:
                t = time.time()
                stacks = np.stack([stack_maps(wmaps, j) for j in range(batch)])
                stage["stack_host"] += time.time() - t
                fut = label_u8(det_vars, jnp.asarray(stacks))
                if pending_label is not None:
                    collect_label(pending_label)
                pending_label = fut
            times.append(time.time() - t0 - sum(times))
        pending = cur
    t = time.time()
    imgs, wmaps = pending()
    stage["gen_wait"] += time.time() - t
    if not gen_only:
        t = time.time()
        stacks = np.stack([stack_maps(wmaps, j) for j in range(batch)])
        stage["stack_host"] += time.time() - t
        if pending_label is not None:
            collect_label(pending_label)
        collect_label(label_u8(det_vars, jnp.asarray(stacks)))
        # stage 4: threshold filter + edge completion + pseudo-COCO build
        # (the F1-max threshold itself comes from the real-source analysis
        # pass in production; applying it here is the per-image cost).
        t = time.time()
        from agenda_tpu.annotate.coco import predictions_to_pseudo_coco

        coco = predictions_to_pseudo_coco(records, 0.005, 42.36,
                                          (out_size, out_size))
        stage["pseudo_coco"] += time.time() - t
        assert len(coco["images"]) == batch * repeats
        assert coco["annotations"], "stage 4 must process real boxes"
    times.append(time.time() - t0 - sum(times))
    total = time.time() - t0
    img_per_sec = batch * repeats / total

    if gen_only:
        metric = "512px SD images/sec/chip with DAAM heatmaps (20-step PLMS, CFG)"
    else:
        metric = ("512px SD images+pseudo-labels/sec/chip (20-step PLMS gen "
                  "+ DAAM heatmaps + stack + yolov8 labeling + pseudo-COCO)")
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
    if not gen_only:
        n = batch * repeats
        print(
            "# stage breakdown (wall, pipelined): "
            + " ".join(f"{k}={v:.3f}s" for k, v in stage.items())
            + f" | {len(records)} records, {len(coco['annotations'])} pseudo boxes"
            + f" | composed {img_per_sec:.3f} img+label/s vs gen-blocked-only "
              f"{n / max(stage['gen_wait'], 1e-9):.3f}",
            file=sys.stderr,
        )

    profile_dir = os.environ.get("BENCH_PROFILE")
    if profile_dir:
        # Per-op device report of ONE steady-state generation batch
        # (BENCH_PROFILE=<dir>): the data for the generation-plateau work.
        from agenda_tpu.utils import xprof
        from agenda_tpu.utils.profiling import maybe_profile

        with maybe_profile(profile_dir):
            imgs, _ = pipe(prompt, seeds=list(range(batch)),
                           num_inference_steps=steps, words=words,
                           out_size=out_size, tgate_step=tgate)
        rep = xprof.device_op_report(profile_dir, iters=1, top=30)
        print(xprof.format_report(rep), file=sys.stderr)


if __name__ == "__main__":
    main()
