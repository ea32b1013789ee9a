from vit_ae_plus_plus_tpu.utils.metrics import roc_auc, acc_pred, find_vals

__all__ = ["roc_auc", "acc_pred", "find_vals"]
