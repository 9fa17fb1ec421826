#!/usr/bin/env bash
# Stage 1: learnable tokens + UNet with cross-attention regularization.
# TPU equivalent of data_generation/finetune_sd_token.sh. NOTE: like the
# reference script, supply --json_file_name (train_data.json: {path: prompt}).
python -m agenda_tpu.cli.finetune_sd_token \
  --pretrained_model_name_or_path output/LINZ-UGRC/sd1.4 \
  --dataset_folder Data \
  --json_file_name "${TRAIN_JSON:-train_data.json}" \
  --validation_prompts "An aerial view image with {} cars in {} New Zealand" "An aerial view image with {} cars in {} Utah" \
  --max_train_steps 9000 \
  --validation_steps 300 \
  --checkpointing_steps 300 \
  --train_batch_size 4 \
  --learning_rate 5e-7 \
  --snr_gamma 5 \
  --checkpoints_total_limit 3 \
  --tracker_project_name tensorboard \
  --output_dir output/LINZ-UGRC/sd1.4-token-finetune-stage-one \
  --object_token "new_token" \
  --n_object_embedding 1 \
  --initialize_token "cars" "Utah" "New Zealand" \
  --reg_weight 0.5 \
  --report_to tensorboard \
  --train_token \
  --with_cross_attn_reg \
  --train_unet
# --gradient_checkpointing (reference finetune_sd_token.sh:19, a GPU-memory
# necessity) is not needed on TPU at bs 4: the un-remat'ed step fits one
# v5e chip and runs faster (288 ms/step measured). Re-add for bigger batches.
