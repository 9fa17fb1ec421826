"""Pipeline orchestrator tests: stage DAG resolution, resume semantics, and a
tiny-fixture end-to-end run through every stage (the reference's manual README
sequence, data_annotation/README.md:8-61 + data_generation/README.md:8-86,
executed by one CLI)."""

import glob
import json
import os
import pickle

import numpy as np
import pytest
from PIL import Image

from agenda_tpu.cli import pipeline as pl
from fixtures import make_tiny_pipeline_dir


def _cfg(root, **kw):
    cfg = pl.PipelineConfig(
        work_dir=os.path.join(root, "run"),
        base_model=os.path.join(root, "pipe"),
        dataset_folder=os.path.join(root, "ds"),
        train_json="data.json",
        num_images=4,
        sd_steps=1, token_steps_stage1=1, token_steps_stage2=1,
        resolution=32, image_size=112,
        detector="yolov8",
        real_train_root=os.path.join(root, "real"),
        real_train_ann="ann.json",
        real_target_test_root=os.path.join(root, "real"),
        real_target_test_ann="ann.json",
        thresh_conf=0.0,
        extra_args={
            "finetune_sd": ["--train_batch_size", "1",
                            "--checkpointing_steps", "100"],
            "token_stage1": ["--train_batch_size", "1",
                             "--checkpointing_steps", "100"],
            "token_stage2": ["--train_batch_size", "1",
                             "--checkpointing_steps", "100"],
            "generate_source": ["--batch-size", "4",
                                "--num-inference-steps", "2"],
            "generate_target": ["--batch-size", "4",
                                "--num-inference-steps", "2"],
            "generate_target_nocars": ["--batch-size", "4",
                                       "--num-inference-steps", "2"],
            "det_real_source": ["--max-epochs", "1", "--batch-size", "2"],
            "det_synthetic_heatmap": ["--max-epochs", "1", "--batch-size", "2"],
            "det_synthetic_target": ["--max-epochs", "1", "--batch-size", "2"],
            "refine": ["--num_epochs", "1", "--train_batch_size", "8",
                       "--test_batch_size", "8", "--crop_size", "64"],
        },
        **kw,
    )
    return cfg


def _make_fixtures(root):
    make_tiny_pipeline_dir(os.path.join(root, "pipe"))
    rng = np.random.RandomState(0)
    ds = os.path.join(root, "ds")
    os.makedirs(ds, exist_ok=True)
    prompts = {}
    for i in range(2):
        Image.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)).save(
            os.path.join(ds, f"img{i}.png"))
        prompts[f"img{i}.png"] = "an aerial view image with cars in utah"
    with open(os.path.join(ds, "data.json"), "w") as f:
        json.dump(prompts, f)
    # tiny "real" detector set with GT
    real = os.path.join(root, "real")
    os.makedirs(os.path.join(real, "images"), exist_ok=True)
    images, anns = [], []
    for i in range(4):
        Image.fromarray(rng.randint(0, 255, (112, 112, 3), np.uint8)).save(
            os.path.join(real, "images", f"{i}.png"))
        images.append({"id": i, "file_name": f"{i}.png", "width": 112,
                       "height": 112})
        anns.append({"id": i + 1, "image_id": i, "category_id": 1,
                     "bbox": [30.0, 30.0, 42.36, 42.36], "area": 42.36 ** 2,
                     "iscrowd": 0})
    with open(os.path.join(real, "ann.json"), "w") as f:
        json.dump({"images": images, "annotations": anns,
                   "categories": [{"id": 1, "name": "small"}]}, f)


def test_stage_dag_names_and_config_roundtrip(tmp_path):
    cfg = _cfg(str(tmp_path))
    path = str(tmp_path / "cfg.json")
    cfg.to_json(path)
    back = pl.PipelineConfig.from_json(path)
    assert back == cfg
    names = [s.name for s in pl.build_stages(cfg)]
    # full reference DAG, in dependency order
    assert names == [
        "finetune_sd", "token_stage1", "token_stage2",
        "generate_source", "generate_target", "generate_target_nocars",
        "stack_source", "stack_target",
        "empty_ann_source", "empty_ann_target", "empty_ann_target_nocars",
        "det_real_source", "test_real_source", "threshold_source",
        "label_synthetic_source", "pseudo_source",
        "det_synthetic_heatmap", "label_synthetic_target", "refine",
        "det_synthetic_target", "evaluate",
    ]
    # skip_full_finetune drops the first stage and retargets token_stage1
    cfg2 = _cfg(str(tmp_path), skip_full_finetune=True)
    stages2 = pl.build_stages(cfg2)
    assert stages2[0].name == "token_stage1"
    assert cfg2.base_model in stages2[0].argv
    # device_aug flows to every det_train stage
    cfg3 = _cfg(str(tmp_path), device_aug=True)
    for s in pl.build_stages(cfg3):
        assert ("--device-aug" in s.argv) == (s.module == "det_train")


def test_unknown_config_key_rejected(tmp_path):
    path = str(tmp_path / "bad.json")
    with open(path, "w") as f:
        json.dump({"work_dir": "x", "no_such_key": 1}, f)
    with pytest.raises(ValueError, match="no_such_key"):
        pl.PipelineConfig.from_json(path)


def test_stage_selection_and_dry_run(tmp_path, capsys):
    cfg = _cfg(str(tmp_path))
    path = str(tmp_path / "cfg.json")
    cfg.to_json(path)
    pl.main(["--config", path, "--dry-run", "--stages", "stack_target"])
    out = capsys.readouterr().out
    assert "stack_target" in out and "daam_new_token_v1_heatmaps" in out
    with pytest.raises(SystemExit):
        pl.main(["--config", path, "--stages", "nope"])


@pytest.mark.slow
def test_pipeline_end_to_end_tiny(tmp_path):
    root = str(tmp_path)
    _make_fixtures(root)
    cfg = _cfg(root)
    path = os.path.join(root, "cfg.json")
    cfg.to_json(path)

    # run the generation side + annotation up to the target labeling
    pl.main(["--config", path, "--until-stage", "label_synthetic_target"])
    wd = cfg.work_dir
    assert os.path.exists(os.path.join(wd, "sd-finetune", "model_index.json"))
    assert glob.glob(os.path.join(wd, "token-stage-one",
                                  "learned_embeds_steps_*.bin"))
    src_imgs = os.path.join(wd, "Synthetic", "LINZ-with-cars", "images")
    assert len(os.listdir(src_imgs)) == 4
    assert os.path.isdir(os.path.join(wd, "Synthetic", "LINZ-with-cars",
                                      "daam_stack_heatmaps"))
    assert glob.glob(os.path.join(wd, "Synthetic", "LINZ-with-cars",
                                  "annotations_coco_FakeBBoxes*Pseudo-*.json"))
    pred_tgt = os.path.join(wd, "work_dirs", "yolov8_synthetic_heatmap",
                            "prediction_syn_target.pkl")
    assert os.path.exists(pred_tgt)

    # resume: everything already done must skip (manifest grows by 0 entries)
    manifest = os.path.join(wd, "pipeline_manifest.jsonl")
    n_before = sum(1 for _ in open(manifest))
    pl.main(["--config", path, "--until-stage", "label_synthetic_target"])
    assert sum(1 for _ in open(manifest)) == n_before

    # doctor the target predictions so every refine bucket is populated
    # (random tiny-detector scores don't span pos/neg/hard thresholds)
    records = pickle.load(open(pred_tgt, "rb"))
    for r in records:
        r["pred_instances"] = {
            "scores": np.array([0.9, 0.5, 0.2]),
            "labels": np.zeros(3, np.int64),
            "bboxes": np.array([[30, 30, 72, 72], [0, 0, 42, 42],
                                [60, 60, 100, 100]], np.float32),
        }
    pickle.dump(records, open(pred_tgt, "wb"))

    # finish the chain
    pl.main(["--config", path, "--from-stage", "refine"])
    refined = glob.glob(os.path.join(wd, "Synthetic", "UGRC-with-cars",
                                     "*Clf-Refine.json"))
    assert refined
    coco = json.load(open(refined[0]))
    assert coco["categories"] == [{"id": 1, "name": "small"}]
    final_pred = os.path.join(wd, "work_dirs", "yolov8_synthetic_target",
                              "prediction_real_target.pkl")
    assert os.path.exists(final_pred)
    final_records = pickle.load(open(final_pred, "rb"))
    assert len(final_records) == 4

    # every executed stage is in the manifest with argv + timing
    entries = [json.loads(l) for l in open(manifest)]
    ran = {e["stage"] for e in entries}
    assert "finetune_sd" in ran and "evaluate" in ran
    assert all(e["seconds"] >= 0 for e in entries)
