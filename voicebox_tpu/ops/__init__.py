from .masks import (
    coin_flip,
    mask_from_frac_lengths,
    mask_from_start_end_indices,
    prob_mask_like,
    reduce_masks_with_and,
)
from .interp import curtail_or_pad, interpolate_1d
from .ode import odeint, odeint_euler, odeint_midpoint, odeint_rk4
from .gateloop import gated_linear_recurrence
from .flash_attention import attend, flash_attention, reference_attention
from .ring_attention import ring_attention
from .mas import maximum_path
from .forward_sum import forward_sum_loss
