"""Headline benchmark: 512x512 SD images+PSEUDO-LABELS/sec/chip.

Runs the full production chain on one chip — the north-star metric is
"10,000 512-px images/hour WITH heatmaps + pseudo-labels" (BASELINE.md:47),
so the headline composes every stage, not just generation:

  1. generate: full SD-1.x UNet, 20 PLMS steps, CFG, fused per-token DAAM
     heatmap accumulation, VAE decode, on-device 512->112 resize
     (data_generation/data_generation.py:56-86);
  2. stack: 3 per-word heatmaps -> RGB heatmap image, R=object G=fg
     B=inverted-bg (postprocess_heatmap.py:36-50);
  3. label: TRAINED yolov8 predict on the 112-px stacks at the detector's
     128-px img_scale with the on-device u8 resize (mmdet tools/test.py
     role) — quick-trained + F1-max-calibrated via detect/bench_labeler.py,
     cached in .bench_cache/, operating point clipped to 1-10 boxes/img;
  4. pseudo-COCO: score filter + edge completion + fake 42.36-px boxes
     (ConvertPredToCOCOPseudoAnnotations.ipynb cells 4-7);
  5. refine classifier at the reference recipe (80 epochs, 224-px crops,
     refine_label.py:189-235) — per-image optimizer steps match any
     campaign size by construction. BENCH_NO_REFINE=1 for the r4 metric.

The SD weights are random (generation throughput is weight-independent);
the labeler's are trained. Stages 1+3 run pipelined exactly like the
production CLIs (one batch in flight). Generated images are written as
PNGs (the production artifact; refine crops from them).

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

    # BENCH_FLASH_MIN_DIM: dispatch experiment knob (65 = measured default:
    # XLA fused attention below D=65; 40 = Pallas flash everywhere).
    unet = UNet2DConditionModel(
        unet_cfg, dtype=dtype,
        flash_min_dim=int(os.environ.get("BENCH_FLASH_MIN_DIM", "65")))
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

    # -- stage 3 setup: TRAINED yolov8 labeler at the reference geometry
    # (128-px img_scale over 112-px stacks — Synthetic_Heatmap/yolov8.py)
    # with the runner's on-device u8 resize (detect/runner.py predict_u8).
    # Quick-trained on the procedural heatmap domain + F1-max-calibrated
    # threshold, cached under .bench_cache/ (detect/bench_labeler.py) so the
    # stage-4/5 per-box volume is a trained detector's, not noise.
    if not gen_only:
        from agenda_tpu.data.device_resize import resize_weights
        from agenda_tpu.detect.bench_labeler import prepare_stack_labeler

        fam, det_vars, f1max_thr = prepare_stack_labeler(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache"),
            log=lambda m: print(m, file=sys.stderr))
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
    raw = []                # per-image (bboxes, scores) — all valid dets
    stage = {"gen_wait": 0.0, "png_host": 0.0, "stack_host": 0.0,
             "label_wait": 0.0, "pseudo_coco": 0.0, "refine": 0.0}
    times = []
    import tempfile

    png_dir = tempfile.mkdtemp(prefix="bench_png_")

    n_png = [0]

    def save_pngs(imgs):
        # Production writes every generated image to disk
        # (data_generation.py:60); refine crops from these files.
        t = time.time()
        for j in range(len(imgs)):
            Image.fromarray(imgs[j]).save(
                os.path.join(png_dir, f"{n_png[0]}.png"))
            n_png[0] += 1
        stage["png_host"] += time.time() - t

    def collect_label(fut):
        t = time.time()
        boxes, scores, valid = jax.device_get(fut)
        stage["label_wait"] += time.time() - t
        sb = out_size / 128.0  # scale detector coords back to 112 px
        for k in range(len(boxes)):
            keep = valid[k].astype(bool)
            raw.append((boxes[k][keep] * sb, scores[k][keep]))

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
                save_pngs(imgs)
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
        save_pngs(imgs)
        t = time.time()
        stacks = np.stack([stack_maps(wmaps, j) for j in range(batch)])
        stage["stack_host"] += time.time() - t
        if pending_label is not None:
            collect_label(pending_label)
        collect_label(label_u8(det_vars, jnp.asarray(stacks)))

        n_img = batch * repeats
        # Operating point: the calibrated F1-max threshold, clipped into the
        # score band passing 1-10 boxes/img on THESE stacks (the random-
        # weight SD's score distribution is arbitrary; a trained campaign's
        # is what the F1-max threshold was calibrated for). Keeps the
        # stage-4/5 per-box volume at the production 1-10 boxes/img.
        all_scores = np.sort(np.concatenate([s for _, s in raw]))[::-1]

        def q_for(k_per_img):
            i = min(int(k_per_img * n_img), len(all_scores) - 1)
            return float(all_scores[i])

        cutoff = float(np.clip(f1max_thr, q_for(10), q_for(1)))
        records = []
        for i, (bx, sc) in enumerate(raw):
            keep = sc > cutoff
            records.append({
                "img_path": os.path.join(png_dir, f"{i}.png"),
                "pred_instances": {
                    "bboxes": bx[keep],
                    "scores": sc[keep],
                    "labels": np.zeros(int(keep.sum()), np.int64),
                },
            })
        boxes_per_img = sum(len(r["pred_instances"]["scores"])
                            for r in records) / n_img

        # stage 4: threshold filter + edge completion + pseudo-COCO build
        # (ConvertPredToCOCOPseudoAnnotations.ipynb cells 4-7).
        t = time.time()
        from agenda_tpu.annotate.coco import predictions_to_pseudo_coco

        coco = predictions_to_pseudo_coco(records, cutoff, 42.36,
                                          (out_size, out_size))
        stage["pseudo_coco"] += time.time() - t
        assert len(coco["images"]) == n_img
        assert coco["annotations"], "stage 4 must process real boxes"

    times.append(time.time() - t0 - sum(times))
    total = time.time() - t0

    # stage 5: refine classifier (refine_label.py:189-235), billed at the
    # production-AMORTIZED per-image rate. The reference recipe is a
    # CAMPAIGN-level stage — 80 epochs at bs 256 over the pos/neg crops,
    # a full eval pass per epoch, one test pass over the unlabeled crops
    # (refine_label.py:268-352) — so its per-image cost is
    #   80*(crops_train/img)*(t_step/256 + t_eval/512)
    #   + (crops_unlabeled/img)*(t_eval/512)
    # with the step times MEASURED warm at the reference batch geometry on
    # this chip and crops/img taken from this run's real detections. Running
    # the 80-epoch loop over a 40-image bench campaign instead would bill
    # compile + partial-batch padding to every image (measured 600 s — 46x
    # the whole generation stage) that a 10k-image campaign amortizes away.
    # Bucket thresholds map the reference's 0.75/0.35/0.05 onto this score
    # distribution's quantiles at the same boxes/img occupancy
    # (~1 pos / ~2 unlabeled / ~3 neg per img).
    refine_note = ""
    if not gen_only and not int(os.environ.get("BENCH_NO_REFINE", "0")):
        import pickle

        import optax

        from agenda_tpu.annotate.classifier import (
            init_classifier,
            make_classifier_predict,
            make_classifier_train_step,
        )
        from agenda_tpu.annotate.refine import construct_data, crops_to_array
        from agenda_tpu.cli import refine_label

        full_records = [{
            "img_path": os.path.join(png_dir, f"{i}.png"),
            "pred_instances": {
                "bboxes": bx, "scores": sc,
                "labels": np.zeros(len(sc), np.int64)},
        } for i, (bx, sc) in enumerate(raw)]
        data = construct_data(full_records, q_for(1), q_for(3), q_for(6),
                              42.36, (out_size, out_size), png_dir)
        ctr, cte = len(data.train_crops), len(data.test_crops)

        # Refine is a campaign-level stage: production runs it AFTER the
        # generation campaign with the whole chip, so free the SD pipeline's
        # HBM before measuring (also avoids OOM-retry device failures, which
        # can wedge this tunneled backend — STATUS round-2/round-5 notes).
        import gc

        del _imgs, _maps, imgs, wmaps, pending
        if not os.environ.get("BENCH_PROFILE"):
            del pipe  # the end-of-run profile hook needs it otherwise
        gc.collect()

        tx = optax.adam(1e-4)
        model, cstate = init_classifier(jax.random.key(0), tx)
        cstep = make_classifier_train_step(model, tx)
        cpred = make_classifier_predict(model)
        crops64 = crops_to_array(data.train_crops[:64])
        # Per-CROP rate normalization: ResNet-50 at 224 px is compute-bound
        # from bs ~64 up, so t_step/bs is batch-insensitive; start at the
        # reference bs 256 and halve on OOM (the composed bench shares HBM
        # with the resident SD pipeline — a real campaign runs refine as its
        # own stage with the whole chip).
        K = 5
        tb = lb = mk = eb = pr = None
        for bs_t in (128, 64, 32):
            try:
                tb = jnp.asarray(np.resize(crops64, (bs_t, 224, 224, 3)))
                lb = jnp.zeros((bs_t,), jnp.int32)
                mk = jnp.ones((bs_t,), jnp.float32)
                cstate, _ = cstep(cstate, tb, lb, mk)
                jax.block_until_ready(cstate.params)      # compile train step
                t = time.time()
                for _ in range(K):
                    cstate, _ = cstep(cstate, tb, lb, mk)
                jax.block_until_ready(cstate.params)
                t_step = (time.time() - t) / K
                del tb, lb, mk
                tb = lb = mk = None
                eb = jnp.asarray(np.resize(crops64, (bs_t, 224, 224, 3)))
                jax.block_until_ready(cpred(cstate, eb))  # compile eval
                t = time.time()
                for _ in range(K):
                    pr = cpred(cstate, eb)
                jax.block_until_ready(pr)
                t_pred = (time.time() - t) / K
                del eb, pr
                break
            except jax.errors.JaxRuntimeError as e:
                if "RESOURCE_EXHAUSTED" not in str(e) or bs_t == 32:
                    raise
                del tb, lb, mk, eb, pr
                tb = lb = mk = eb = pr = None
                print(f"# refine bench: bs {bs_t} OOM next to the resident "
                      f"SD pipeline; halving", file=sys.stderr)

        # per-CROP rates (t/bs_t): the reference geometry is bs 256 train /
        # bs 512 eval, but ResNet-50 at 224 px is compute-bound from ~bs 32
        # so the per-crop rate transfers.
        per_img = (80.0 * (ctr / n_img) * (t_step / bs_t + t_pred / bs_t)
                   + (cte / n_img) * (t_pred / bs_t))
        stage["refine"] = per_img * n_img
        total += stage["refine"]
        refine_note = (f" | refine amortized: {ctr} train + {cte} unlabeled "
                       f"crops, t_step(bs{bs_t})={t_step * 1e3:.0f}ms "
                       f"t_eval(bs{bs_t})={t_pred * 1e3:.0f}ms -> "
                       f"{per_img * 1e3:.1f} ms/img")

        # Artifact completeness, OFF the metric clock: the real refine CLI
        # end-to-end (bucketing -> train -> rescue -> refined.json) at a
        # bench-sized epoch count.
        pkl_path = os.path.join(png_dir, "pred.pkl")
        with open(pkl_path, "wb") as f:
            pickle.dump(full_records, f)
        refine_label.main([
            "--prediction_pkl", pkl_path,
            "--synthetic_image_base_path", png_dir,
            "--json_save_path", os.path.join(png_dir, "refined.json"),
            "--checkpoint_save_path", os.path.join(png_dir, "clf"),
            "--num_epochs", os.environ.get("BENCH_REFINE_EPOCHS", "8"),
            "--train_batch_size", "64",
            "--test_batch_size", "64", "--crop_size", "224",
            "--seed", "0",
            "--pos_thresh", str(q_for(1)),
            "--neg_thresh", str(q_for(3)),
            "--hard_neg_thresh", str(q_for(6)),
        ])
        assert os.path.exists(os.path.join(png_dir, "refined.json"))
    img_per_sec = batch * repeats / total

    if gen_only:
        metric = "512px SD images/sec/chip with DAAM heatmaps (20-step PLMS, CFG)"
    elif int(os.environ.get("BENCH_NO_REFINE", "0")):
        metric = ("512px SD images+pseudo-labels/sec/chip (20-step PLMS gen "
                  "+ DAAM heatmaps + stack + yolov8 labeling + pseudo-COCO)")
    else:
        metric = ("512px SD images+pseudo-labels/sec/chip (20-step PLMS gen "
                  "+ DAAM heatmaps + stack + trained-yolov8 labeling "
                  "+ pseudo-COCO + refine classifier)")
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
            + f" | {len(records)} records, {len(coco['annotations'])} pseudo "
              f"boxes ({boxes_per_img:.1f} boxes/img at cutoff {cutoff:.3f}; "
              f"calibrated F1-max thr {f1max_thr:.3f})"
            + f" | composed {img_per_sec:.3f} img+label/s vs gen-blocked-only "
              f"{n / max(stage['gen_wait'], 1e-9):.3f}" + refine_note,
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
