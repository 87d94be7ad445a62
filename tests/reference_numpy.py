"""Plain-NumPy oracle implementations of the pipeline equations.

Written independently from the JAX ops, directly from the published
equations (SURVEY.md section 2.9), so the tests compare two independent
implementations.  Everything here is float64/complex128 and deliberately
naive (explicit loops where that is clearest).
"""

import numpy as np


# ---------------------------------------------------------------- STFT ----

def blackman_periodic(size):
    n = np.arange(size)
    return (0.42 - 0.5 * np.cos(2 * np.pi * n / size)
            + 0.08 * np.cos(4 * np.pi * n / size))


def stft_np(x, size, shift, *, fading=True, pad=True, window=None):
    x = np.asarray(x, dtype=np.float64)
    if window is None:
        window = blackman_periodic(size)
    if fading:
        x = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(size - shift,) * 2])
    n = x.shape[-1]
    if pad:
        frames = max(1, int(np.ceil((n - size + shift) / shift)))
    else:
        frames = (n - size + shift) // shift
    full = (frames - 1) * shift + size
    if full > n:
        x = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, full - n)])
    out = np.empty((*x.shape[:-1], frames, size // 2 + 1),
                   dtype=np.complex128)
    for t in range(frames):
        seg = x[..., t * shift:t * shift + size] * window
        out[..., t, :] = np.fft.rfft(seg, n=size, axis=-1)
    return out


def istft_np(X, size, shift, *, fading=True, window=None):
    X = np.asarray(X)
    if window is None:
        window = blackman_periodic(size)
    # biorthogonal synthesis window
    denom = (window ** 2).reshape(-1, shift).sum(0)
    syn = window / np.tile(denom, size // shift)
    T = X.shape[-2]
    out = np.zeros((*X.shape[:-2], (T - 1) * shift + size))
    for t in range(T):
        out[..., t * shift:t * shift + size] += (
            np.fft.irfft(X[..., t, :], n=size) * syn)
    if fading:
        out = out[..., size - shift:out.shape[-1] - (size - shift)]
    return out


# ----------------------------------------------------------------- WPE ----

def wpe_np(Y, taps, delay, iterations, psd_context=0):
    """Y (F, D, T) complex128 -> (F, D, T)."""
    F, D, T = Y.shape
    X = Y.copy()
    for _ in range(iterations):
        power = np.mean(np.abs(X) ** 2, axis=1)       # (F, T)
        if psd_context > 0:
            sm = np.empty_like(power)
            for t in range(T):
                lo, hi = max(0, t - psd_context), min(T, t + psd_context + 1)
                sm[:, t] = power[:, lo:hi].mean(axis=-1)
            power = sm
        floor = 1e-10 * power.max(axis=-1, keepdims=True)
        inv_power = 1.0 / np.maximum(power, floor)
        X = np.empty_like(Y)
        for f in range(F):
            Yt = np.zeros((taps * D, T), dtype=Y.dtype)
            for tau in range(taps):
                shiftn = delay + tau
                Yt[tau * D:(tau + 1) * D, shiftn:] = Y[f, :, :T - shiftn]
            R = (Yt * inv_power[f]) @ Yt.conj().T
            P = (Yt * inv_power[f]) @ Y[f].conj().T
            R = (R + R.conj().T) / 2
            try:
                G = np.linalg.solve(R, P)
            except np.linalg.LinAlgError:
                G = np.linalg.pinv(R) @ P
            X[f] = Y[f] - G.conj().T @ Yt
    return X


# -------------------------------------------------------------- cacGMM ----

def cacgmm_posteriors_np(Y, activity, iterations, iterations_post,
                         eigenvalue_floor=1e-10):
    """Y (F, T, D) complex128, activity (K, T) -> (F, K, T).

    Faithful 'eigh' conditioning variant.
    """
    F, T, D = Y.shape
    K = activity.shape[0]
    init = np.asarray(activity, dtype=np.float64)
    init = np.where(init == 0, 1e-10, init)
    init = init / init.sum(axis=0, keepdims=True)
    mask = np.asarray(activity, dtype=bool)

    out = np.empty((F, K, T))
    for f in range(F):
        y = Y[f]
        norm = np.maximum(np.linalg.norm(y, axis=-1, keepdims=True),
                          np.finfo(np.float64).tiny)
        z = y / norm

        gamma = init.copy()
        q = np.ones((K, T))

        def m_step(gamma, q):
            denom = gamma.sum(axis=-1)                    # (K,)
            weight = denom / max(denom.sum(), 1e-300)
            precisions = np.empty((K, D, D), dtype=np.complex128)
            logdets = np.empty(K)
            for k in range(K):
                coeff = gamma[k] / np.maximum(q[k], np.finfo(float).tiny)
                B = D * (z * coeff[:, None]).T @ z.conj() / max(
                    denom[k], np.finfo(float).tiny)
                B = (B + B.conj().T) / 2
                ew, ev = np.linalg.eigh(B)
                ew = np.maximum(ew.real, max(ew.real.max(),
                                             np.finfo(float).tiny)
                                * eigenvalue_floor)
                precisions[k] = (ev / ew) @ ev.conj().T
                logdets[k] = np.log(ew).sum()
            logw = np.log(np.maximum(weight, np.finfo(float).tiny))
            return logw, precisions, logdets

        def e_step(params, with_mask):
            logw, precisions, logdets = params
            q = np.empty((K, T))
            for k in range(K):
                q[k] = np.einsum('td,de,te->t', z.conj(), precisions[k],
                                 z).real
            q = np.maximum(q, np.finfo(float).tiny)
            ll = logw[:, None] - D * np.log(q) - logdets[:, None]
            ll -= ll.max(axis=0, keepdims=True)
            g = np.exp(ll)
            if with_mask:
                g = g * mask
            g = g / np.maximum(g.sum(axis=0, keepdims=True),
                               np.finfo(float).tiny)
            return g, q

        params = m_step(gamma, q)
        for _ in range(iterations - 1):
            gamma, q = e_step(params, True)
            params = m_step(gamma, q)
        if iterations_post == 0:
            gamma, _ = e_step(params, True)
        else:
            for _ in range(iterations_post - 1):
                gamma, q = e_step(params, False)
                params = m_step(gamma, q)
            gamma, _ = e_step(params, False)
        out[f] = gamma
    return out


# ---------------------------------------------------------- beamformer ----

def psd_np(Y, mask):
    """Y (F, D, T), mask (F, T) -> (F, D, D)."""
    F, D, T = Y.shape
    out = np.empty((F, D, D), dtype=np.complex128)
    for f in range(F):
        w = Y[f] * mask[f]
        out[f] = w @ Y[f].conj().T / max(mask[f].sum(),
                                         np.finfo(float).tiny)
    return out


def mvdr_souden_np(cov_x, cov_n, eps=1e-10):
    F, D, _ = cov_x.shape
    mat = np.empty_like(cov_x)
    for f in range(F):
        try:
            phi = np.linalg.solve(cov_n[f], cov_x[f])
        except np.linalg.LinAlgError:
            phi = np.linalg.pinv(cov_n[f]) @ cov_x[f]
        lam = max(np.trace(phi).real, eps)
        mat[f] = phi / lam
    # global SNR-optimal reference channel
    num = np.einsum('fdr,fde,fer->r', mat.conj(), cov_x, mat).real
    den = np.einsum('fdr,fde,fer->r', mat.conj(), cov_n, mat).real
    ref = int(np.argmax(num / np.maximum(den, eps)))
    return mat[..., ref], ref


def ban_np(w, cov_n):
    D = w.shape[-1]
    out = np.empty_like(w)
    for f in range(w.shape[0]):
        nw = cov_n[f] @ w[f]
        num = np.sqrt(abs(w[f].conj() @ cov_n[f] @ nw / D))
        den = abs(w[f].conj() @ nw)
        out[f] = w[f] * num / max(den, np.finfo(float).tiny)
    return out


def gev_np(cov_x, cov_n, eps_scale=1e-10):
    import scipy.linalg
    F, D, _ = cov_x.shape
    out = np.empty((F, D), dtype=np.complex128)
    for f in range(F):
        n = (cov_n[f] + cov_n[f].conj().T) / 2
        n = n + eps_scale * max(np.trace(n).real / D,
                                np.finfo(float).tiny) * np.eye(D)
        ew, ev = scipy.linalg.eigh(
            (cov_x[f] + cov_x[f].conj().T) / 2, n)
        w = ev[:, -1]
        w = w * np.exp(-1j * np.angle(w[0]))
        out[f] = w
    return out
