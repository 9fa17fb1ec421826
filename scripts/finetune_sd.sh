#!/usr/bin/env bash
# Full SD fine-tune on balanced source+target aerial data.
# TPU equivalent of the reference's data_generation/finetune_sd.sh
# (same hyperparameters; one process drives the whole mesh — no launcher).
python -m agenda_tpu.cli.finetune_sd \
  --pretrained_model_name_or_path "${SD_BASE:-models/stable-diffusion-v1-4}" \
  --dataset_folder Data \
  --json_file_name train_data_first_stage.json \
  --max_train_steps 15000 \
  --validation_steps 400 \
  --validation_prompts "An aerial view image with cars in New Zealand" "An aerial view image with cars in Utah" \
  --checkpointing_steps 400 \
  --train_batch_size 32 \
  --learning_rate 1e-6 \
  --snr_gamma 5 \
  --checkpoints_total_limit 3 \
  --tracker_project_name tensorboard \
  --output_dir output/LINZ-UGRC/sd1.4 \
  --report_to tensorboard
# NOTE: the reference passes --gradient_checkpointing (finetune_sd.sh:16) out
# of GPU-memory necessity. On TPU it is no longer needed at the reference
# per-chip batch 4: the Pallas flash backward keeps activations small enough
# that the un-remat'ed step fits one v5e chip and runs 12% faster
# (301 vs 343 ms/step sustained). Add the flag back for bigger batches.
# Latent-moment caching is DEFAULT ON (exact; r5 chip measurement 300.4 ->
# 244.5 ms/step at bs 4); pass --no_cache_latents for the reference's
# encode-every-step behavior.
