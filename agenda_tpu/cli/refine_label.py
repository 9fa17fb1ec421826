"""CLI: pseudo-label refinement with a ResNet-50 crop classifier.

Flag-compatible with ``data_annotation/refine_label.py:242-279`` (same flags,
defaults, artifacts: ``resnet_best_accuracy.pth``-style checkpoints become
safetensors with the same stems, the refined COCO JSON is identical in
structure). Evaluation, like the reference, runs on the training crops
(there is no held-out split — refine_label.py:301-303).
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

logger = logging.getLogger("agenda_tpu.refine_label")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Pseudo-label refinement (TPU).")
    p.add_argument("--prediction_pkl", type=str, help="prediction file path")
    p.add_argument("--synthetic_image_base_path", type=str, help="image path")
    p.add_argument("--json_save_path", type=str, help="prediction json save path")
    p.add_argument("--checkpoint_save_path", type=str, help="classifier checkpoint save path")
    p.add_argument("--pos_thresh", type=float, default=0.75)
    p.add_argument("--neg_thresh", type=float, default=0.35)
    p.add_argument("--hard_neg_thresh", type=float, default=0.05)
    p.add_argument("--num_classes", type=int, default=1)
    p.add_argument("--num_epochs", type=int, default=80)
    p.add_argument("--train_batch_size", type=int, default=256)
    p.add_argument("--test_batch_size", type=int, default=512)
    p.add_argument("--lr", type=float, default=4e-4)
    p.add_argument("--crop_size", type=int, default=224)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--pretrained_backbone", type=str, default=None,
                   help="torchvision resnet50 .pth/.safetensors for ImageNet init "
                        "(the reference uses pretrained=True, refine_label.py:326; "
                        "zero-egress deployments supply the file explicitly).")
    return p.parse_args(argv)


def main(argv=None):
    import jax
    import jax.numpy as jnp
    import optax

    from agenda_tpu.annotate.classifier import (
        batches_padded,
        init_classifier,
        make_classifier_predict,
        make_classifier_train_step,
    )
    from agenda_tpu.annotate.coco import save_coco
    from agenda_tpu.annotate.records import load_predictions
    from agenda_tpu.annotate.refine import (
        append_positive_test_annotations,
        construct_data,
        crops_to_array,
        macro_f1_binary,
    )
    from agenda_tpu.io.diffusers_io import _write_safetensors, _flatten

    args = parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    os.makedirs(args.checkpoint_save_path, exist_ok=True)

    records = load_predictions(args.prediction_pkl)
    data = construct_data(
        records, args.pos_thresh, args.neg_thresh, args.hard_neg_thresh,
        rgb_image_base_path=args.synthetic_image_base_path,
    )
    logger.info("crops: %d train (%d pos), %d unlabeled",
                len(data.train_crops), sum(data.train_labels), len(data.test_crops))

    rng_np = np.random.default_rng(args.seed)
    train_x = crops_to_array(data.train_crops, args.crop_size)
    train_y = np.asarray(data.train_labels, np.int32)
    test_x = crops_to_array(data.test_crops, args.crop_size)

    tx = optax.adam(args.lr)
    model, state = init_classifier(jax.random.key(args.seed), tx,
                                   num_classes=args.num_classes,
                                   image_size=args.crop_size)
    if args.pretrained_backbone:
        import dataclasses as _dc

        from agenda_tpu.io.resnet_import import load_torchvision_resnet50
        from flax import traverse_util as _tu

        pre_params, pre_bs = load_torchvision_resnet50(
            args.pretrained_backbone, num_classes=args.num_classes
        )
        flat = _tu.flatten_dict(state.params)
        flat.update(_tu.flatten_dict(jax.tree.map(jnp.asarray, pre_params)))
        state = _dc.replace(
            state,
            params=_tu.unflatten_dict(flat),
            batch_stats=jax.tree.map(jnp.asarray, pre_bs),
        )
        logger.info("initialized backbone from %s", args.pretrained_backbone)
    train_step = make_classifier_train_step(model, tx)
    predict = make_classifier_predict(model)

    def save_ckpt(name):
        params, batch_stats = jax.device_get((state.params, state.batch_stats))
        flat = {"params." + ".".join(k): np.asarray(v)
                for k, v in _flatten(params).items()}
        flat.update({"batch_stats." + ".".join(k): np.asarray(v)
                     for k, v in _flatten(batch_stats).items()})
        _write_safetensors(os.path.join(args.checkpoint_save_path, name), flat)

    def evaluate():
        if len(train_x) == 0:
            return 0.0, 0.0
        preds = []
        for imgs, labels, mask, idx in batches_padded(
            train_x, train_y, args.test_batch_size, False, rng_np
        ):
            p = np.asarray(predict(state, jnp.asarray(imgs)))
            preds.append(p[mask > 0])
        preds = np.concatenate(preds).astype(np.int32)
        acc = float(np.mean(preds == train_y))
        f1 = macro_f1_binary(preds, train_y)
        return acc, f1

    best_acc = best_f1 = 0.0
    best_state_f1 = state
    for epoch in range(args.num_epochs if len(train_x) else 0):
        # Random hflip augmentation per epoch (refine_label.py:291).
        aug = crops_to_array(data.train_crops, args.crop_size, hflip_rng=rng_np)
        for imgs, labels, mask, _ in batches_padded(
            aug, train_y, args.train_batch_size, True, rng_np
        ):
            state, loss = train_step(state, jnp.asarray(imgs), jnp.asarray(labels),
                                     jnp.asarray(mask))
        acc, f1 = evaluate()
        logger.info("Epoch %d: Train Accuracy: %.4f, Train f1: %.4f", epoch, acc, f1)
        if acc > best_acc:
            best_acc = acc
            save_ckpt("resnet_best_accuracy.safetensors")
        if f1 > best_f1:
            best_f1 = f1
            best_state_f1 = state
            save_ckpt("resnet_best_f1.safetensors")

    # Test with the best-F1 weights (refine_label.py:351-353).
    state = best_state_f1
    pos_ids = []
    if len(test_x):
        for imgs, labels, mask, idx in batches_padded(
            test_x, np.zeros(len(test_x), np.int32), args.test_batch_size, False, rng_np
        ):
            p = np.asarray(predict(state, jnp.asarray(imgs)))
            pos_ids += [int(i) for i, keep, m in zip(idx, p, mask) if m > 0 and keep]

    coco = append_positive_test_annotations(data.annotations_coco, data.test_anns, pos_ids)
    save_coco(coco, args.json_save_path)
    logger.info("kept %d/%d unlabeled crops; wrote %s",
                len(pos_ids), len(test_x), args.json_save_path)


if __name__ == "__main__":
    main()
