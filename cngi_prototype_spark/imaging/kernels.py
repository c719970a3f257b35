"""Gridding-kernel math (driver-side numpy; no scipy dependency).

Reference parity: the prolate-spheroidal gridding kernel and its image-
domain correcting function used by the standard gridder
(``/root/reference/ngcasa/imaging/_imaging_utils/_gridding_convolutional_kernels.py:35-198``),
and the airy-disk primary-beam model
(``/root/reference/ngcasa/imaging/_imaging_utils/_make_pb_symmetric.py:25-80``).

The PSWF evaluation uses Schwab's published rational approximation for the
m=6, alpha=1 spheroidal function ("Indirect Imaging" 1984) — the same
public algorithm the reference (and CASA, and every radio-astronomy
gridder since SDE) uses. The Bessel J1 needed by the airy disk is the
Abramowitz & Stegun 9.4 polynomial approximation (|err| < 4e-8), standing
in for ``scipy.special.jn(1, x)`` which is unavailable here.

These are tiny driver-side arrays (kernel taps, per-plane correction
images); they ship to executors as broadcast literals / closure
captures — never as shuffled data.
"""

from __future__ import annotations

import numpy as np

# Schwab rational-approximation coefficients for psi(m=6, alpha=1),
# split at |nu| = 0.75 (public constants, Schwab 1984 Table III).
_PSWF_P = (
    (8.203343e-2, -3.644705e-1, 6.278660e-1, -5.335581e-1, 2.312756e-1),
    (4.028559e-3, -3.697768e-2, 1.021332e-1, -1.201436e-1, 6.412774e-2),
)
_PSWF_Q = (
    (1.0, 8.212018e-1, 2.078043e-1),
    (1.0, 9.599102e-1, 2.918724e-1),
)


def pswf(nu: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Evaluate the spheroidal function at |nu| <= 1 (0 outside).

    Returns ``(correcting, gridding)`` where ``gridding = (1-nu²)·psi(nu)``
    is the uv-domain convolution kernel and ``correcting = psi(nu)`` is the
    image-domain taper to divide out after the FFT.
    """
    nu = np.abs(np.asarray(nu, dtype=np.float64))
    hi = nu >= 0.75
    edge = np.where(hi, 1.0, 0.75)
    d = nu * nu - edge * edge
    num = np.zeros_like(nu)
    den = np.zeros_like(nu)
    for part, (p_row, q_row) in enumerate(zip(_PSWF_P, _PSWF_Q)):
        sel = hi if part else ~hi
        dp = d[sel]
        num[sel] = np.polyval(p_row[::-1], dp)
        den[sel] = np.polyval(q_row[::-1], dp)
    psi = np.where(den > 0, num / np.where(den == 0, 1.0, den), 0.0)
    psi = np.where(nu > 1.0, 0.0, psi)
    return psi, (1.0 - nu * nu) * psi


def pswf_kernel_1d(oversampling: int, support: int) -> np.ndarray:
    """Oversampled half-kernel lookup table, indexed by
    ``abs(oversampling*i_tap + frac_offset_idx)`` exactly as the gridder
    does (reference ``_create_prolate_spheroidal_kernel_1D``, :151-158).
    Length ``oversampling*(support//2 + 1)``; the outermost cell is 0.
    """
    half = support // 2
    table = np.zeros(oversampling * (half + 1), dtype=np.float64)
    nu = np.arange(oversampling * half, dtype=np.float64) / (half * oversampling)
    table[: oversampling * half] = pswf(nu)[1]
    return table


def pswf_correcting_image(n_u: int, n_v: int) -> np.ndarray:
    """Separable image-plane correcting function psi(u)·psi(v) over the
    padded image grid (reference ``_create_prolate_spheroidal_kernel``
    image part, :80-98). Centered at n//2 like fftshifted output.
    """
    cu = pswf(_centered_coords(n_u))[0]
    cv = pswf(_centered_coords(n_v))[0]
    return np.outer(cu, cv)


def _centered_coords(n: int) -> np.ndarray:
    # coordinates in [-1, 1) with 0 at index n//2
    return (np.arange(n) - n // 2) / (n // 2)


def bessel_j1(x: np.ndarray) -> np.ndarray:
    """Bessel function of the first kind, order 1 (A&S 9.4.4/9.4.6)."""
    x = np.asarray(x, dtype=np.float64)
    ax = np.abs(x)
    out = np.empty_like(ax)

    small = ax < 3.0
    t = (x[small] / 3.0) ** 2
    out[small] = x[small] * (
        0.5 - 0.56249985 * t + 0.21093573 * t**2 - 0.03954289 * t**3
        + 0.00443319 * t**4 - 0.00031761 * t**5 + 0.00001109 * t**6
    )

    big = ~small
    tb = 3.0 / ax[big]
    f1 = (0.79788456 + 0.00000156 * tb + 0.01659667 * tb**2
          + 0.00017105 * tb**3 - 0.00249511 * tb**4 + 0.00113653 * tb**5
          - 0.00020033 * tb**6)
    theta = (ax[big] - 2.35619449 + 0.12499612 * tb + 0.0000565 * tb**2
             - 0.00637879 * tb**3 + 0.00074348 * tb**4 + 0.00079824 * tb**5
             - 0.00029166 * tb**6)
    out[big] = np.sign(x[big]) * f1 * np.cos(theta) / np.sqrt(ax[big])
    return out


def airy_disk(r: np.ndarray, blockage_ratio: float = 0.0,
              ipower: int = 2) -> np.ndarray:
    """Airy voltage (ipower=1) / power (ipower=2) pattern at radius
    ``r = k·aperture·sin(theta)``; obscured variant for nonzero blockage
    (reference ``_airy_disk``, ``_make_pb_symmetric.py:25-80``).
    """
    r = np.asarray(r, dtype=np.float64)
    safe = np.where(r == 0.0, 1.0, r)
    if blockage_ratio == 0.0:
        vp = 2.0 * bessel_j1(safe) / safe
    else:
        e = blockage_ratio
        vp = (2.0 * bessel_j1(safe) / safe
              - 2.0 * e * bessel_j1(safe * e) / safe) / (1.0 - e * e)
    vp = np.where(r == 0.0, 1.0, vp)
    return vp ** ipower
