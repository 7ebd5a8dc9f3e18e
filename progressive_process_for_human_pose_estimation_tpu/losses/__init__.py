from .losses import (  # noqa: F401
    ce_loss,
    combined_ohem_ce_loss,
    masked_ce_loss,
    masked_mse_loss,
    mse_loss,
    ohem_ce_loss,
    ohem_mse_loss,
    per_stack_ce,
    per_stack_mse,
    split_channel_ce_loss,
)
