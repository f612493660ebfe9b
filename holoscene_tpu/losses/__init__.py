from holoscene_tpu.losses.holoscene_loss import LossConfig, holoscene_loss
