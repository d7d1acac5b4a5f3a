"""Model-FLOPs-utilization accounting for compiled XLA programs.

``program_flops`` reads the FLOP count XLA's cost model assigns to a
compiled executable; ``device_peak_flops`` maps the attached accelerator
to its dense-matmul peak. MFU = (program FLOPs / wall time) / peak — the
roofline artifact BASELINE.md's conv-gap analysis is pinned with
(round-4 VERDICT item 2). TPU f32 matmuls execute as 3-pass bf16 on the
MXU, so the f32-effective peak is peak/3; report both.
"""

from __future__ import annotations

from typing import Optional

import jax

#: dense bf16 peak FLOP/s per chip by TPU generation (public specs)
_TPU_PEAK_BF16 = {
    "v4": 275e12,
    "v5 lite": 197e12,   # v5e
    "v5e": 197e12,
    "v5p": 459e12,
    "v6 lite": 918e12,   # trillium
    "v6e": 918e12,
}


def device_peak_flops(device=None) -> Optional[float]:
    """Dense bf16 peak FLOP/s of the device, or None if unknown (CPU)."""
    d = device if device is not None else jax.devices()[0]
    kind = getattr(d, "device_kind", "").lower()
    for key, peak in _TPU_PEAK_BF16.items():
        if key in kind:
            return peak
    return None


def program_flops(compiled) -> Optional[float]:
    """FLOPs XLA's cost analysis assigns to a compiled executable
    (jit(f).lower(*args).compile()); None when the backend reports no
    cost model (e.g. some CPU builds).

    CAVEAT: XLA counts while/scan BODIES ONCE (trip counts are not
    multiplied in), so any scanned training step is undercounted —
    measured on the chip: the PPO update reports 1.7 TFLOP where the
    analytic count is ~32 (the 4-epoch x 4-minibatch SGD scan body
    counted once). Use ``network_fwd_flops`` + ``ppo_update_flops`` for
    training-step MFU; this function is only trustworthy for scan-free
    programs."""
    try:
        ca = compiled.cost_analysis()
    except Exception:
        return None
    if ca is None:
        return None
    if isinstance(ca, (list, tuple)):   # older jax: one dict per device
        ca = ca[0] if ca else {}
    flops = ca.get("flops")
    return float(flops) if flops else None


def network_fwd_flops(act_fn, params, obs, key) -> Optional[float]:
    """Per-SAMPLE forward FLOPs, measured by compiling one scan-free
    policy step on a batch (XLA's count is exact without loops)."""
    compiled = jax.jit(act_fn).lower(params, obs, key).compile()
    total = program_flops(compiled)
    return None if total is None else total / obs.shape[0]


def ppo_update_flops(fwd_flops_per_sample: float, nbatch: int,
                     noptepochs: int) -> float:
    """Analytic model FLOPs of one PPO update: the rollout runs every
    sample forward once, each SGD epoch re-runs the whole batch forward
    + backward (bwd = 2x fwd, the standard MFU convention)."""
    return fwd_flops_per_sample * nbatch * (1.0 + 3.0 * noptepochs)
