"""f32-exact GELU via a polynomial erf — the default-path throughput lever.

The reference applies exact-erf GELU throughout the encoder
(``meg_decoding/models.py:314-321, 373-374`` — torch ``F.gelu``).  On TPU
v5e, XLA's erf lowering costs ~11 ms/step of VPU transcendental time at
B=256 seq2seq (round-4 trace, RESULTS.md); the tanh-approximate GELU
reclaimed that but deviates from erf by up to ~3e-4 on activations (PARITY
deviation 17, certified non-inferior but still a deviation).

``gelu_erf_poly`` reclaims PART of that cost WITHOUT the accuracy
deviation: a piecewise-polynomial erf accurate to ≤2.5 f32 ulp everywhere
(measured on a 2M-point grid against float64 scipy.special.erf,
tests/test_ops.py), with NO transcendental at all.  Round-5 on-chip
measurements (interleaved windows, B=256 bf16 cached, ms/step) settled
the cost model — and FALSIFIED the round-4 hypothesis that the single
``exp`` in XLA's erfc lowering was the gap:

  exact erf 50.9 | erf_poly (autodiff bwd) 51.8 | erf_poly + custom JVP
  46.0 | tanh 38.8

i.e. the exp-free forward alone is NO faster than XLA's erf — the erf→
tanh gap is total VPU op count (XLA's tanh is a short hardware-cheap
rational; any ~26-coefficient piecewise erf costs about what XLA's erfc
does).  What DOES pay is the backward: autodiff through the three Horner
branches roughly doubles the op count, while the hand-written JVP below
(the analytic Φ(x) + x·φ(x), torch's own F.gelu backward form) makes
``erf_poly`` −4.9 ms/step (−10%) vs exact erf with f32-exact numerics.
The dispatcher therefore serves ``'erf_poly'`` with the custom JVP;
``tanh`` remains the fastest lever (PARITY dev. 17, certified) and
``erf_poly`` is the zero-deviation middle option.  The forward:

  |u| ≤ 1          erf(u) = u · P₆(u²)          (odd poly — relative-
                                                 accurate through zero)
  1 < |u| ≤ 2.2    erf(u) = M₉(|u| − 1.6)       (mirrored by sign)
  2.2 < |u| ≤ 3.92 erf(u) = T₈(|u| − 3.06)
  |u| > 3.92       ±1      (erf(3.92) is within half an f32 ulp of 1)

Coefficients are Chebyshev-projection fits converted to the power basis
(centered per interval so f32 Horner stays conditioned).  Cost: ~24 FMAs
+ 3 selects per element — no exp, no divide.  Always evaluates in f32 and
rounds once back to the input dtype (for bf16 activations the 2.5-ulp f32
error is ~5000× below one bf16 ulp).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["erf_poly", "gelu_erf_poly", "gelu_erf_poly_cjvp", "gelu",
           "resolve_impl"]


def resolve_impl(impl: str | None, approximate: bool) -> str:
    """Config plumbing: an explicit ``gelu_impl`` wins; otherwise the legacy
    ``gelu_approximate`` bool selects tanh vs exact erf."""
    if impl is not None:
        return impl
    return "tanh" if approximate else "erf"

_SQRT_HALF = 0.7071067811865476
_UMAX = 3.92
_B1 = 2.2
_C1 = 1.6   # mid-interval Horner center, (1 + 2.2)/2
_C2 = 3.06  # tail-interval Horner center, (2.2 + 3.92)/2

# erf(u)/u over u² ∈ [0, 1] (increasing powers of u²)
_P = (
    1.1283791642036094, -0.3761262253264794, 0.11283567972615145,
    -0.026853537766035242, 0.005188380744448103, -0.0008014557174955704,
    7.87898134825695e-05,
)
# erf(u) over u ∈ [1, 2.2] (increasing powers of u − 1.6)
_M = (
    0.9763483813576088, 0.08722905144327303, -0.13956618665278978,
    0.1197950067239394, -0.049321021018725146, -0.004384953262741153,
    0.015549647872260673, -0.005987836463361508, -0.0011343875580184023,
    0.0013519651430629316,
)
# erf(u) over u ∈ [2.2, 3.92] (increasing powers of u − 3.06)
_T = (
    0.9999849227209708, 9.675459819190899e-05, -0.00029653724335458495,
    0.0005731544734380906, -0.0007728300529582685, 0.0007715595580880792,
    -0.00060149821458484, 0.00034682825182840094, -0.00010350064171581603,
)


def _horner(coef, x):
    acc = jnp.full_like(x, coef[-1])
    for c in coef[-2::-1]:
        acc = acc * x + c
    return acc


def erf_poly(u: jnp.ndarray) -> jnp.ndarray:
    """Exp-free piecewise-polynomial erf, ≤2.5 f32 ulp of the true value on
    the whole line.  Computes in f32; returns f32 (callers round once)."""
    u32 = u.astype(jnp.float32)
    au = jnp.abs(u32)
    inner = au * _horner(_P, au * au)
    mid = _horner(_M, au - _C1)
    tail = _horner(_T, au - _C2)
    mag = jnp.where(au <= 1.0, inner, jnp.where(au <= _B1, mid, tail))
    mag = jnp.where(au > _UMAX, 1.0, mag)
    return jnp.sign(u32) * mag


def gelu_erf_poly(x: jnp.ndarray) -> jnp.ndarray:
    """Exact-erf GELU via ``erf_poly``: 0.5·x·(1 + erf(x/√2)), f32 internal,
    one rounding back to the input dtype."""
    x32 = x.astype(jnp.float32)
    out = 0.5 * x32 * (1.0 + erf_poly(x32 * _SQRT_HALF))
    return out.astype(x.dtype)


_INV_SQRT_2PI = 0.3989422804014327


@jax.custom_jvp
def gelu_erf_poly_cjvp(x: jnp.ndarray) -> jnp.ndarray:
    """``gelu_erf_poly`` with a hand-written JVP: the analytic GELU
    derivative Φ(x) + x·φ(x) (the SAME closed form torch autograd applies to
    ``F.gelu``'s backward) instead of autodiff through the three Horner
    branches — autodiff of the piecewise polynomial roughly doubles the
    backward's VPU op count for the same mathematical derivative."""
    return gelu_erf_poly(x)


@gelu_erf_poly_cjvp.defjvp
def _gelu_erf_poly_jvp(primals, tangents):
    (x,), (t,) = primals, tangents
    x32 = x.astype(jnp.float32)
    cdf = 0.5 * (1.0 + erf_poly(x32 * _SQRT_HALF))
    pdf = _INV_SQRT_2PI * jnp.exp(-0.5 * x32 * x32)
    out = (x32 * cdf).astype(x.dtype)
    dout = ((cdf + x32 * pdf) * t.astype(jnp.float32)).astype(x.dtype)
    return out, dout


def gelu(x: jnp.ndarray, impl: str = "erf") -> jnp.ndarray:
    """GELU dispatcher: 'erf' (XLA's exact lowering — the reference's
    ``F.gelu``), 'erf_poly' (this module with the custom JVP — same
    function to a few ulp, measured −10% step time vs 'erf' on v5e),
    'tanh' (the approximate form, PARITY dev 17 — fastest, certified),
    'erf_poly_autodiff' (measurement hook: the polynomial with autodiff
    backward — measured NO faster than 'erf')."""
    if impl == "erf":
        return jax.nn.gelu(x, approximate=False)
    if impl == "tanh":
        return jax.nn.gelu(x, approximate=True)
    if impl == "erf_poly":
        return gelu_erf_poly_cjvp(x)
    if impl == "erf_poly_autodiff":  # A/B hook (tools/ablate_kernels.py)
        return gelu_erf_poly(x)
    raise ValueError(f"unknown gelu impl {impl!r}")
