"""Full AGenDA pipeline integration test on tiny fixtures.

Chains every stage end-to-end through the real CLIs (SURVEY.md §3 call
stacks): token fine-tuning -> generation with heatmaps -> heatmap stacking ->
empty annotations -> detector labeling -> threshold selection + pseudo COCO ->
label refinement -> final detector training on refined labels -> evaluation.
Everything runs on the tiny fixture checkpoint; the assertions are structural
(files exist, formats round-trip, values finite) — quality parity needs real
data/weights.
"""

import glob
import json
import os
import pickle

import numpy as np
import pytest
from PIL import Image

from fixtures import make_tiny_pipeline_dir


@pytest.mark.slow
def test_full_pipeline_chain(tmp_path):
    root = str(tmp_path)
    os.chdir(root)

    # --- fixtures: tiny SD pipeline + tiny prompt dataset -------------------
    make_tiny_pipeline_dir("pipe")
    os.makedirs("ds", exist_ok=True)
    rng = np.random.RandomState(0)
    prompts = {}
    for i in range(2):
        Image.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)).save(f"ds/img{i}.png")
        prompts[f"img{i}.png"] = "an aerial view image with cars in utah"
    with open("ds/data.json", "w") as f:
        json.dump(prompts, f)

    # --- stage 1: token fine-tune (1 step, produces learned embeds) ---------
    from agenda_tpu.cli import finetune_sd_token

    finetune_sd_token.main([
        "--pretrained_model_name_or_path", "pipe",
        "--dataset_folder", "ds", "--json_file_name", "data.json",
        "--output_dir", "tok", "--resolution", "16",
        "--train_batch_size", "1", "--max_train_steps", "1",
        "--checkpointing_steps", "100",
        "--object_token", "new_token", "--initialize_token", "cars", "utah",
        "--train_token", "--train_unet", "--with_cross_attn_reg",
        "--reg_weight", "0.5", "--seed", "0",
    ])
    bins = sorted(glob.glob("tok/learned_embeds_steps_*.bin"))
    full_models = sorted(glob.glob("tok/full_model_step_*"))
    assert bins and full_models

    # --- generation with heatmaps -------------------------------------------
    from agenda_tpu.cli import data_generation

    data_generation.main([
        "--save-dir", "syn",
        "--pretrained-model-path", full_models[0],
        "--learnable-tokens-embedding-path", bins[0],
        "--prompt", "an aerial view image with {} cars in {} utah",
        "--initialize_token", "cars", "utah",
        "--word_token_heatmaps", "cars", "--store_learnable_token_heatmaps",
        "--num-images", "4", "--batch-size", "4",
        "--num-inference-steps", "2", "--image-size", "112",
        "--resolution", "32",
    ])
    assert len(os.listdir("syn/images")) == 4

    # --- heatmap stacking ----------------------------------------------------
    from agenda_tpu.cli import postprocess_heatmap

    postprocess_heatmap.main([
        "--save-dir", "syn",
        "--object-heatmap-path", "daam_cars_heatmaps",
        "--fg-heatmap-path", "daam_new_token_v0_heatmaps",
        "--bg-heatmap-path", "daam_new_token_v1_heatmaps",
    ])
    assert len(os.listdir("syn/daam_stack_heatmaps")) == 4

    # --- empty annotations for the unlabeled synthetic set ------------------
    from agenda_tpu.cli import build_empty_annotation

    template = {"categories": [{"id": 1, "name": "small"}],
                "images": [{"id": 0, "file_name": "t", "width": 1, "height": 1}],
                "annotations": []}
    json.dump(template, open("template.json", "w"))
    build_empty_annotation.main([
        "--image-dir", "syn/images", "--save-dir", "syn/annotations_coco_Empty.json",
        "--coco-dir", "template.json",
    ])

    # --- "real source" detector: train 1 epoch, label the synthetic set -----
    from agenda_tpu.cli import det_test, det_train

    # tiny GT for the fake real-source set: reuse the synthetic images with
    # arbitrary fixed boxes so training runs.
    anns = []
    images = []
    for i, name in enumerate(sorted(os.listdir("syn/images"))):
        images.append({"id": i, "file_name": name, "width": 112, "height": 112})
        anns.append({"id": i, "image_id": i, "category_id": 1,
                     "bbox": [30.0, 30.0, 42.36, 42.36], "area": 42.36**2, "iscrowd": 0})
    json.dump({"categories": template["categories"], "images": images,
               "annotations": anns}, open("syn/ann.json", "w"))

    det_train.main([
        "--preset", "synthetic_heatmap", "--detector", "yolov8",
        "--train-root", "syn", "--train-ann", "ann.json",
        "--work-dir", "work", "--max-epochs", "1", "--batch-size", "2",
    ])
    det_test.main([
        "--config", "work/config.json",
        "--checkpoint", "work/latest.safetensors",
        "--out", "prediction.pkl",
        "--test-root", "syn", "--test-ann", "ann.json",
    ])
    records = pickle.load(open("prediction.pkl", "rb"))
    assert len(records) == 4

    # --- threshold selection + pseudo COCO ----------------------------------
    from agenda_tpu.cli import select_threshold

    select_threshold.main([
        "--prediction_pkl", "prediction.pkl",
        "--emit-pseudo-coco", "--thresh-conf", "0.0",
        "--out-dir", ".",
    ])
    pseudo = glob.glob("annotations_coco_FakeBBoxes*.json")
    assert pseudo

    # --- label refinement -----------------------------------------------------
    from agenda_tpu.cli import refine_label

    # Build a prediction pkl with scores spanning all refine buckets.
    for r in records:
        r["pred_instances"] = {
            "scores": np.array([0.9, 0.5, 0.2]),
            "labels": np.zeros(3, np.int64),
            "bboxes": np.array([[30, 30, 72, 72], [0, 0, 42, 42], [60, 60, 100, 100]],
                               np.float32),
        }
    pickle.dump(records, open("prediction2.pkl", "wb"))
    refine_label.main([
        "--prediction_pkl", "prediction2.pkl",
        "--synthetic_image_base_path", "syn/images",
        "--json_save_path", "refined.json",
        "--checkpoint_save_path", "clf",
        "--num_epochs", "1", "--train_batch_size", "8", "--test_batch_size", "8",
        "--crop_size", "64",
    ])
    refined = json.load(open("refined.json"))
    assert refined["categories"] == template["categories"]

    # --- final detector on refined labels + evaluation -----------------------
    det_train.main([
        "--preset", "synthetic_target", "--detector", "yolov8",
        "--train-root", "syn", "--train-ann", os.path.abspath("refined.json"),
        "--val-root", "syn", "--val-ann", "ann.json",
        "--work-dir", "work_final", "--max-epochs", "1", "--batch-size", "2",
    ])
    assert os.path.exists("work_final/latest.safetensors")

    from agenda_tpu.cli import evaluate_pseudo_ann

    p, r = evaluate_pseudo_ann.main([
        "--ground_truth_file", "syn/ann.json",
        "--pseudo_pred_file", pseudo[0],
    ])
    assert 0.0 <= p <= 1.0 and 0.0 <= r <= 1.0
