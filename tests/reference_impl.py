"""Independent numpy transcription of the reference algorithm.

A deliberately literal, slow, loop-based float64 implementation of the
improved two-stream emit/absorb sweeps and the driver iteration,
written directly from the published equations (Malik et al. 2017;
Deitrick et al. 2020, 2022) and the behavioral description in
SURVEY.md sections 2-3.  Used by the test suite as an oracle to verify
that the vectorized, scanned, jitted frei_tpu solver reproduces the
reference trajectory step for step.  Unitless CGS throughout.
"""

import numpy as np

from frei_tpu.constants import c, h, hc_over_k, k_B, sigma_sb

FLUX0 = 0.0


def planck(T, lam):
    return 2 * h * c ** 2 / lam ** 5 / np.expm1(hc_over_k / (lam * T))


def e_corr(w0, g0=0.0):
    return np.where(
        w0 > 0.1,
        1.225 - 0.1582 * g0 - 0.1777 * w0 - 0.07465 * g0 ** 2
        + 0.2351 * w0 * g0 - 0.05582 * w0 ** 2,
        1.0,
    )


def propagate(lam, F1_up, F2_down, T_1, T_2, dtau, w0, g0=0.0):
    E = e_corr(w0, g0)
    T = np.exp(-2 * np.sqrt(E * (E - w0) * (1 - w0 * g0)) * dtau)
    zp = 0.5 * (1 + np.sqrt((E - w0) / E / (1 - w0 * g0)))
    zm = 0.5 * (1 - np.sqrt((E - w0) / E / (1 - w0 * g0)))
    chi = zm ** 2 * T ** 2 - zp ** 2
    xi = zp * zm * (1 - T ** 2)
    psi = (zm ** 2 - zp ** 2) * T
    pi_t = np.pi * (1 - w0) / (E - w0)
    B1 = planck(T_1, lam)
    B2 = planck(T_2, lam)
    Bprime = (B1 - B2) / dtau
    F2_up = (1 / chi) * (
        psi * F1_up - xi * F2_down
        + pi_t * (B2 * (chi + xi) - psi * B1
                  + Bprime / (2 * E * (1 - w0 * g0)) * (chi - psi - xi)))
    F1_down = (1 / chi) * (
        psi * F2_down - xi * F1_up
        + pi_t * (B1 * (chi + xi) - psi * B2
                  + Bprime / (2 * E * (1 - w0 * g0)) * (xi + psi - chi)))
    return F2_up, F1_down


def kappa_mock(k_table, mmr, sigma_scat, T, temps_axis, press_axis, p):
    """Bilinear (T, P) interp with fill 0 outside + mock-chemistry MMR
    weighting + scattering, for a single-species table on the run grid."""
    def interp1(axis, x):
        if x < axis[0] or x > axis[-1]:
            return None
        j = np.clip(np.searchsorted(axis, x, side="right") - 1,
                    0, len(axis) - 2)
        f = (x - axis[j]) / (axis[j + 1] - axis[j])
        return j, f

    ti = interp1(temps_axis, T)
    pj = interp1(press_axis, p)
    if ti is None or pj is None:
        k_mol = np.zeros(k_table.shape[-1])
    else:
        (i, tf), (j, pf) = ti, pj
        k_mol = ((1 - tf) * ((1 - pf) * k_table[i, j]
                             + pf * k_table[i, j + 1])
                 + tf * ((1 - pf) * k_table[i + 1, j]
                         + pf * k_table[i + 1, j + 1]))
    k_mol = mmr * k_mol
    return k_mol + sigma_scat, sigma_scat


class MiniFrei:
    """Loop-based reference oracle for a single-species mock-chemistry
    configuration (the golden-test configuration)."""

    def __init__(self, lam_cm, pressures_cgs, k_table, temps_axis,
                 press_axis_cgs, mmr, sigma_scat, F_toa, g, m_bar,
                 alpha=1.0, n_dof=5):
        self.lam = lam_cm
        self.p = pressures_cgs
        self.k_table = k_table
        self.temps_axis = temps_axis
        self.press_axis = press_axis_cgs
        self.mmr = mmr
        self.sigma = sigma_scat
        self.F_toa = F_toa
        self.g = g
        self.m_bar = m_bar
        self.alpha = alpha
        self.n_dof = n_dof

    def cp(self):
        return (2 + self.n_dof) / (2 * self.m_bar) * k_B

    def dz(self, T1, p1, p2):
        return k_B * T1 / (self.m_bar * self.g) * np.log(p1 / p2)

    def conv_flux(self, T1, T2, p1, p2):
        dz = self.dz(T1, p1, p2)
        rho = (p1 - p2) / self.g / dz
        gam = (T1 - T2) / dz - self.g / self.cp()
        if gam > 0:
            lmix = self.alpha * k_B * T1 / (self.m_bar * self.g)
            return (rho * self.cp() * lmix ** 2
                    * np.sqrt(self.g / T1) * gam ** 1.5)
        return 0.0

    def dt_i(self, p1, p2, T1, T2, div):
        dz = self.dz(T1, p1, p2)
        x = div * dz
        f_pre = 1e5 / abs(x) ** 0.9 if x != 0 else 1.0
        dt_rad = self.cp() * p1 / (sigma_sb * self.g * T1 ** 3)
        dgam = (T1 - T2) / dz - self.g / self.cp()
        if dgam > 0:
            return f_pre * min(dt_rad, np.sqrt(T1 / (self.g * dgam)))
        return f_pre * dt_rad

    def d_temp(self, div, p1, p2, T1, dt):
        dz = self.dz(T1, p1, p2)
        rho = (p1 - p2) / self.g / dz
        return div * dt / (rho * self.cp())

    def _kappa(self, T, p):
        return kappa_mock(self.k_table, self.mmr, self.sigma, T,
                          self.temps_axis, self.press_axis, p)

    def emit(self, temps, F_up, F_down):
        L = len(self.p)
        temps = temps.copy()
        F_up, F_down = F_up.copy(), F_down.copy()
        dtaus = [np.ones_like(self.lam)]
        dT = np.zeros(L)
        for i in range(1, L):
            if i == L - 1:
                p2 = self.p[i] * self.p[-2] / self.p[-3]
                T2 = temps[i]
            else:
                p2 = self.p[i + 1]
                T2 = temps[i + 1]
            p1, T1 = self.p[i], temps[i]
            k, sig = self._kappa(T1, p1)
            dtau = (p1 - p2) / self.g * k
            dtaus.append(dtau)
            w0 = sig / (sig + k)
            F2_down = F_down[i + 1] if i < L - 1 else self.F_toa
            F1_up = F_up[i]
            F2_up, F1_down = propagate(self.lam, F1_up, F2_down,
                                       T1, T2, dtau, w0)
            if i < L - 1:
                F_up[i + 1] = F2_up
            F_down[i] = F1_down
            bol = lambda f: np.trapezoid(f, self.lam)  # noqa: E731
            dF_rad = (bol(F2_up) - bol(F2_down)) - (bol(F1_up) - bol(F1_down))
            dz = self.dz(T1, p1, p2)
            div = (dF_rad + self.conv_flux(T1, T2, p1, p2)) / dz
            dt = self.dt_i(p1, p2, T1, T2, div)
            dT[i] = self.d_temp(div, p1, p2, T1, dt)
        return F_up, F_down, temps - dT, dT, np.array(dtaus)

    def absorb(self, temps, F_up, F_down):
        L = len(self.p)
        temps = temps.copy()
        F_up, F_down = F_up.copy(), F_down.copy()
        dtaus = [np.ones_like(self.lam)]
        dT = np.zeros(L)
        for i in range(L - 2, -1, -1):
            p1, T1 = self.p[i], temps[i]
            p2, T2 = self.p[i + 1], temps[i + 1]
            k, sig = self._kappa(T1, p1)
            dtau = (p1 - p2) / self.g * k
            dtaus.append(dtau)
            w0 = sig / (sig + k)
            F2_down = F_down[i + 1]
            F1_up = F_up[i]
            F2_up, F1_down = propagate(self.lam, F1_up, F2_down,
                                       T1, T2, dtau, w0)
            F_up[i + 1] = F2_up
            F_down[i] = F1_down
            bol = lambda f: np.trapezoid(f, self.lam)  # noqa: E731
            dF_rad = (bol(F2_up) - bol(F2_down)) - (bol(F1_up) - bol(F1_down))
            dz = self.dz(T1, p1, p2)
            div = (dF_rad + self.conv_flux(T1, T2, p1, p2)) / dz
            dt = self.dt_i(p1, p2, T1, T2, div)
            dT[i] = self.d_temp(div, p1, p2, T1, dt)
        return F_up, F_down, temps - dT, dT, np.array(dtaus)

    def emission_spectrum(self, init_temps, n_timesteps=1,
                          n_zero_crossings=2, convergence_dT=3.0):
        L, W = len(self.p), len(self.lam)
        temps = init_temps.copy()
        F_up = np.zeros((L, W))
        F_down = np.zeros((L, W))
        hist = []
        for _ in range(n_timesteps):
            F_up, F_down, temps, dT_e, _ = self.emit(temps, F_up, F_down)
            hist.append(temps.copy())
            F_up, F_down, temps, dT_a, _ = self.absorb(temps, F_up, F_down)
            hist.append(temps.copy())
            th = np.array(hist)            # (cols, L)
            diffs = np.diff(th, axis=0)
            flips = np.count_nonzero(
                np.sign(diffs[1:]) != np.sign(diffs[:-1]), axis=0)
            conv = (flips > n_zero_crossings) | (np.abs(dT_a) < convergence_dT)
            if np.all(conv):
                break
        F_up, F_down, temps, dT_f, dtaus = self.emit(temps, F_up, F_down)
        return F_up[-1], temps, np.array(hist).T, dtaus, F_up, F_down
