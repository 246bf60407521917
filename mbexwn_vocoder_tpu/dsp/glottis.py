"""LF glottal-flow model: closed-form pulse spectrum + implicit-parameter solve.

Implements the four-parameter LF model (Fant, Liljencrants & Lin, STL-QPSR
1985) on a normalized period T0=1:

  opening phase  (0..te):   E1(t) = E0 e^{alpha t} sin(wg t),  wg = pi/(oq*am)
  return  phase  (te..1):   E2(t) = -Ee/(eps ta) (e^{-eps (t-te)} - e^{-eps (1-te)})

with te = oq, tp = am*oq, and the two implicit constraints
  (a) eps*ta = 1 - e^{-eps (1-te)}           (return phase reaches ~0 at t=1)
  (b) integral_0^1 E(t) dt = 0               (flow returns to baseline)

solved for epar := eps*ta and alpha by Brent root finding.

Behavioural parity target (same parameter conventions, degenerate-case
thresholds and w->0 / eps->0 limits):
reference: MBExWN_NVoc/glottis/FglotspecLF.py:15-216 and
           MBExWN_NVoc/glottis/FglotLFsynthparams.py:12-191
Used only at model-init time (wavetable construction), pure NumPy/SciPy.
"""
from __future__ import annotations

import numpy as np
import scipy.optimize as sopt


def _exp_imag(x):
    return np.cos(x) + 1j * np.sin(x)


def lf_synth_params(oq: float, am: float, ta: float):
    """Solve the LF implicit equations for (alpha, epar, ta).

    Returns the synthesis parameters alpha and epar = eps*ta, possibly
    adapting ta in degenerate configurations (very large oq, or ta filling
    nearly the whole closed phase), with the same branch thresholds as the
    reference solver (FglotLFsynthparams.py:119-133).
    """
    realization = oq + am + ta
    eps_f = np.finfo(type(realization)).eps if isinstance(realization, float) else np.finfo(np.float64).eps
    if oq <= eps_f or oq >= 1 - eps_f:
        raise RuntimeError("open quotient out of range")
    if am < 0.5 or am >= 1 - eps_f:
        raise RuntimeError("asymmetry is out of range")
    if ta < 0 or ta > (1 - oq):
        raise RuntimeError("return phase length(ta) is out of range")

    te = oq
    wg = np.pi / (oq * am)
    cos_wgte = np.cos(wg * te)
    sin_wgte = np.sin(wg * te)

    def _solve_alpha(eq_alpha):
        # expand a symmetric bracket until the sign changes, then Brent-solve
        alphal, alphar = 0.0, 0.1
        v0 = eq_alpha(0.0)
        if np.abs(v0) > np.finfo(np.float64).eps:
            while (v0 * eq_alpha(alphar) > 0) and (v0 * eq_alpha(-alphar) > 0):
                alphal = alphar
                alphar += 1.0
            if eq_alpha(-alphar) * v0 < 0:
                alphal, alphar = -alphal, -alphar
        else:
            alphal, alphar = -0.1, 0.1
        return sopt.brentq(eq_alpha, alphal, alphar)

    if ta <= np.finfo(np.float32).eps:
        # abrupt closure: zero-area condition reduces to
        # e^{alpha te}(wg cos(wg te) - alpha sin(wg te)) = wg
        alpha = _solve_alpha(lambda a: np.exp(a * oq) * (wg * cos_wgte - a * sin_wgte) - wg)
        return alpha, 0.0, 0.0

    if oq > 0.999:
        # nearly no closed phase: the solve is ill-conditioned and the pulse
        # shape barely depends on ta -- pin intermediate values
        epar = 0.5
        ta = 0.5 * (1 - oq)
    elif ta > 0.99 * (1 - oq):
        # return phase degenerates to a straight line
        epar = 0.0
        ta = 1 - oq
    else:
        # solve epar = 1 - e^{epar (te-1)/ta}; the bracket starts at the
        # stationary point of the residual, epar_min = -ln(-(te-1)/ta)/((te-1)/ta)
        te_m_1_d_ta = (te - 1) / ta
        eleft = -np.log(-te_m_1_d_ta) / te_m_1_d_ta
        epar = sopt.brentq(lambda e: e - 1 + np.exp(e * te_m_1_d_ta), eleft, 1.1)

    # area of the return phase: E2I = integral_{te}^{1} E2 dt (shifted form)
    if epar == 0:
        E2I = -ta / 2
    else:
        ex = np.exp(epar / ta * (te - 1))
        E2I = (-ex * (ta + epar - te * epar) + ta) / (epar * (-1 + ex))

    # zero-net-area condition for alpha given the return-phase area
    wgh2 = wg**2

    def eq_alpha(a):
        return -(-wg * cos_wgte + a * sin_wgte + wg * np.exp(-a * te)) / (a**2 + wgh2) / sin_wgte + E2I

    alpha = _solve_alpha(eq_alpha)
    return alpha, epar, ta


def lf_pulse_spectrum(
    f,
    oq,
    am,
    ta,
    Ee=1.0,
    alpha=-1.0,
    epar=-1.0,
    orig=0.0,
    get_derivative=True,
    dtype=np.float64,
):
    """Closed-form spectrum of the LF glottal-flow derivative (or flow).

    f is the frequency axis normalized by the fundamental (harmonic k at
    value k).  Returns (spec, spec_open, spec_return, alpha, epar, ta) like
    the reference (FglotspecLF.py:15-216).
    """
    eps64 = np.finfo(np.float64).eps
    if oq <= eps64 or oq >= (1 - eps64):
        raise RuntimeError(f"open quotient {oq:f} out of range")
    if am <= 0.5 or am >= (1 - eps64):
        raise RuntimeError(f"asymetry {am:f} is out of range")
    if ta < 0 or ta > (1 - oq):
        raise RuntimeError(f"return phase length(ta) {ta:f} is out of range")
    if ta > 0 and alpha > 0 and epar < 0:
        raise RuntimeError("if ta>0 and alpha is given, epar has to be present too")

    te = dtype(oq)
    wg = dtype(np.pi / (oq * am))
    if alpha <= 0:
        alpha, epar, ta = lf_synth_params(oq, am, ta)
    alpha = dtype(alpha)
    epar = dtype(epar)
    ta = dtype(ta)

    w = (np.asarray(f) * 2 * np.pi).astype(dtype, copy=False)

    # opening phase: analytic Fourier integral of E0 e^{alpha t} sin(wg t)
    E0_2 = dtype(-0.5 * Ee / (np.exp(alpha * te) * np.sin(wg * te)))
    logE0_2 = np.log(E0_2)
    expalphatel = dtype(np.exp(alpha * te + logE0_2))

    # guard the removable singularity when alpha ~ 0 and w hits wg exactly
    epsd = np.finfo(dtype).eps
    wg_eps = epsd if (np.abs(alpha) < epsd and np.min(np.abs(w - wg)) < epsd) else 0.0

    spec1 = (expalphatel * _exp_imag(te * (wg - w)) - E0_2) / (1j * alpha + (w - wg + wg_eps)) - (
        expalphatel * _exp_imag(-te * (w + wg)) - E0_2
    ) / (1j * alpha + (w + wg))

    spec = spec1

    # return phase
    if ta == 0:
        spec2 = dtype(0)
    else:
        bb = np.flatnonzero(w > np.finfo(w.dtype).eps)
        if epar > 0:
            expte1ta = np.exp(epar * (te - 1) / ta)
            hh = np.ones(w.shape, dtype=dtype) * (-1j * (te - 1))
            Efte = _exp_imag(-te * w)
            # l'Hopital limit at w->0 kept via the hh initialisation above
            hh[bb] = (Efte[bb] - _exp_imag(-w[bb])) / w[bb]
            spec2 = ((Ee * ta * (1 - expte1ta)) * Efte + (1j * Ee * epar * expte1ta) * hh) / (
                w * (1j * ta * (expte1ta - 1)) + epar * (expte1ta - 1)
            )
        else:
            # epar == 0: linear return segment from -Ee to 0 over [oq, oq+ta];
            # Fourier integral of (t-ta)/ta e^{-iwt} with w=0 limit -ta/2,
            # shifted to start at t=oq
            spec2 = Ee * ta * 0.5 * np.ones(w.shape, dtype=dtype) + ta * 0j
            spec2[bb] = Ee * (1j * ta * w[bb] - 1 + np.exp(-1j * w[bb] * ta)) / (ta * w[bb] ** 2)
            spec2 *= np.exp(-1j * oq * w)
        spec = spec + spec2

    if get_derivative:
        if w[0] == 0:
            spec[0] = 0
    else:
        # integrate: flow = derivative / (iw), with the DC value computed
        # analytically from the time-domain integrals of both phases
        if w[0] != 0:
            spec = spec / (1j * w)
        else:
            spec[1:] = spec[1:] / (1j * w[1:])
            E0 = -Ee / (np.exp(alpha * oq) * np.sin(wg * oq))
            openingside = (
                E0
                * (
                    -2 * alpha * np.exp(alpha * te) * wg * np.cos(wg * te)
                    + alpha**2 * np.exp(alpha * te) * np.sin(wg * te)
                    - wg**2 * np.exp(alpha * te) * np.sin(wg * te)
                    + wg * te * alpha**2
                    + wg**3 * te
                    + 2 * alpha * wg
                )
                / (alpha**2 + wg**2) ** 2
            )
            if ta > 0:
                epsilon = epar / ta
                expete = np.exp(epsilon * (-1 + te))
                closingside = (
                    -1
                    / 2
                    * Ee
                    * ta**2
                    * (
                        expete
                        * (2 + epsilon**2 + 2 * epsilon + (epsilon * te) ** 2 - 2 * epsilon * te - 2 * epsilon**2 * te)
                        - 2
                    )
                    / (epar**3)
                )
            else:
                closingside = 0
            spec[0] = openingside + closingside

    if abs(orig) > 0:
        spec = spec * _exp_imag(w * dtype(orig))

    return spec, spec1, spec2, alpha, epar, ta


# compatibility aliases mirroring the reference public names
FglotspecLF = lf_pulse_spectrum
FglotLFsynthparams = lf_synth_params
