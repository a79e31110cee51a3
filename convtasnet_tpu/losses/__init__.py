from convtasnet_tpu.losses.pit import (  # noqa: F401
    cal_loss,
    length_mask,
    pit_si_snr,
    reorder_source,
    si_snr_single,
)
