"""FNO: 1-D Fourier Neural Operator (beyond reference).

A second operator-learning family beside `DeepONet` for `PINOODE`
(reference scope: src/pino_ode_solve.jl trains DeepONet/MLP operators; the
reference has no FNO).  The FNO parameterizes the operator kernel in
Fourier space (Li et al. 2021, "Fourier Neural Operator for Parametric
PDEs"): each layer applies a per-mode complex channel mixing to the lowest
`modes` rFFT coefficients along the grid axis plus a pointwise linear
bypass.  This maps naturally onto TPU: the FFT lowers to XLA's native FFT
HLO, and both the mode mixing and the pointwise lift/bypass/projection are
batched matmuls on the MXU.

Discretization invariance: the rFFT/irFFT pair is normalization-consistent
across grid sizes, so a trained FNO evaluates on ANY uniform grid of the
same interval (band-limited inputs give matching outputs at shared nodes —
tested).  The grid MUST be uniform; `solve_pino_ode` enforces GridTraining
for FNO chains.

Layout follows the package convention (features leading, batch trailing):
internal fields are ``(channels, T, P)`` with the time grid in the middle
so the FFT axis is fixed and the channel mixing contracts the leading dim.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import default_float
from .core import Chain, Dense, Module, gelu


def _pointwise(layer, params, x):
    """Apply a Dense/Chain per grid point: (C, *grid, P) -> (C', *grid, P).

    Contracts the channel axis with tensordot instead of reshaping the
    grid/family axes into one dim — a reshape across a mesh-sharded family
    axis would force GSPMD to all-gather it (measured; the PINOPDE
    family-axis sharding test guards this)."""
    if isinstance(layer, Chain):
        for i, sub in enumerate(layer.layers):
            x = _pointwise(sub, params[f"layer_{i}"], x)
        return x
    y = jnp.tensordot(params["weight"], x, axes=((1,), (0,)))
    if layer.use_bias:
        y = y + params["bias"].reshape((-1,) + (1,) * (x.ndim - 1))
    return layer.activation(y)


class SpectralConv1D(Module):
    """Fourier-space channel mixing: keep the lowest `modes` rFFT
    coefficients along axis 1 and mix channels with one complex
    (in_channels, out_channels) matrix per retained mode; all higher modes
    are truncated to zero.  Input/output ``(channels, T, P)``.

    Complex weights are stored as separate real/imag leaves (pytree- and
    optimizer-friendly); init is centered uniform scaled by
    ``1/(in_channels * out_channels)`` (the Li et al. reference scale).
    """

    def __init__(self, in_channels: int, out_channels: int, modes: int):
        self._in = in_channels
        self._out = out_channels
        self.modes = modes

    @property
    def in_dim(self):
        return self._in

    @property
    def out_dim(self):
        return self._out

    def init(self, key):
        kr, ki = jax.random.split(key)
        scale = 1.0 / (self._in * self._out)
        shape = (self.modes, self._in, self._out)
        dtype = default_float()
        return {
            "w_re": scale * jax.random.uniform(kr, shape, dtype, -1.0, 1.0),
            "w_im": scale * jax.random.uniform(ki, shape, dtype, -1.0, 1.0),
        }

    def apply(self, params, x):
        t = x.shape[1]
        xf = jnp.fft.rfft(x, axis=1)                      # (C_in, F, P)
        m = min(self.modes, xf.shape[1])
        w = jax.lax.complex(params["w_re"][:m].astype(x.dtype),
                            params["w_im"][:m].astype(x.dtype))
        yf_low = jnp.einsum("imp,mio->omp", xf[:, :m, :], w)
        pad = xf.shape[1] - m
        yf = jnp.pad(yf_low, ((0, 0), (0, pad), (0, 0)))
        return jnp.fft.irfft(yf, n=t, axis=1)


class SpectralConv2D(Module):
    """2-D Fourier-space channel mixing for fields ``(channels, X, T, P)``:
    rFFT2 over the two grid axes, keep a low-frequency corner — the first
    ``modes[1]`` rFFT coefficients along the last grid axis crossed with the
    first/last ``modes[0]`` rows along the first grid axis (positive and
    negative frequencies; the standard FNO-2D corner-block scheme, Li et al.
    2021) — mix channels per retained mode pair, truncate the rest.

    Two complex weight blocks ``(modes_x, modes_t, in, out)`` stored as
    re/im leaves.  Mode counts are clipped so the two x-frequency blocks
    never overlap on small grids.
    """

    def __init__(self, in_channels: int, out_channels: int, modes):
        self._in = in_channels
        self._out = out_channels
        mx, mt = (modes, modes) if isinstance(modes, int) else tuple(modes)
        self.modes = (int(mx), int(mt))

    @property
    def in_dim(self):
        return self._in

    @property
    def out_dim(self):
        return self._out

    def init(self, key):
        keys = jax.random.split(key, 4)
        scale = 1.0 / (self._in * self._out)
        shape = (self.modes[0], self.modes[1], self._in, self._out)
        dtype = default_float()
        u = lambda k: scale * jax.random.uniform(k, shape, dtype, -1.0, 1.0)
        return {"w1_re": u(keys[0]), "w1_im": u(keys[1]),
                "w2_re": u(keys[2]), "w2_im": u(keys[3])}

    def apply(self, params, x):
        c, nx, nt, p = x.shape
        xf = jnp.fft.rfft2(x, axes=(1, 2))                # (C, X, F, P)
        nf = xf.shape[2]
        mt = min(self.modes[1], nf)
        # non-overlapping positive/negative x-frequency blocks
        mx_pos = min(self.modes[0], (nx + 1) // 2)
        mx_neg = min(self.modes[0], nx // 2)

        def mix(block, w_re, w_im):
            w = jax.lax.complex(w_re.astype(x.dtype), w_im.astype(x.dtype))
            return jnp.einsum("ixtp,xtio->oxtp", block, w)

        y1 = mix(xf[:, :mx_pos, :mt, :],
                 params["w1_re"][:mx_pos, :mt], params["w1_im"][:mx_pos, :mt])
        yf = jnp.zeros((self._out, nx, nf, p), dtype=xf.dtype)
        yf = yf.at[:, :mx_pos, :mt, :].set(y1)
        if mx_neg > 0:
            y2 = mix(xf[:, -mx_neg:, :mt, :],
                     params["w2_re"][:mx_neg, :mt],
                     params["w2_im"][:mx_neg, :mt])
            yf = yf.at[:, -mx_neg:, :mt, :].set(y2)
        return jnp.fft.irfft2(yf, s=(nx, nt), axes=(1, 2))


class FNO2D(Module):
    """2-D Fourier Neural Operator over a uniform tensor grid (the operator
    backbone of `solve_pino_pde`):

    ``apply(params, (p, (x, t)))`` with ``p`` the parameter columns
    ``(in_channels, P)`` (broadcast over the grid as constant channels) or a
    function-valued field ``(in_channels, X, T, P)``, and ``(x, t)`` the two
    uniform grid coordinate arrays (``(Xi,)`` or ``(1, Xi)``), appended as
    coordinate channels.  Returns ``(X, T, P)`` when ``out_channels == 1``
    else ``(out_channels, X, T, P)``.

    Same block structure as `FNO1D`: pointwise lift -> depth ×
    ``act(SpectralConv2D + pointwise bypass)`` -> two-layer projection.
    """

    def __init__(self, in_channels: int, width: int = 32, modes=12,
                 depth: int = 4, out_channels: int = 1, activation=gelu):
        self._in = in_channels
        self.width = width
        mx, mt = (modes, modes) if isinstance(modes, int) else tuple(modes)
        self.modes = (int(mx), int(mt))
        self.depth = depth
        self._out = out_channels
        self.activation = activation
        self.lift = Dense(in_channels + 2, width)
        self.spectral = tuple(SpectralConv2D(width, width, self.modes)
                              for _ in range(depth))
        self.bypass = tuple(Dense(width, width) for _ in range(depth))
        self.proj = Chain(Dense(width, width, activation),
                          Dense(width, out_channels))

    @property
    def in_dim(self):
        return self._in

    @property
    def out_dim(self):
        return self._out

    def init(self, key):
        keys = jax.random.split(key, 2 * self.depth + 2)
        params = {"lift": self.lift.init(keys[0]),
                  "proj": self.proj.init(keys[1])}
        for i in range(self.depth):
            params[f"spectral_{i}"] = self.spectral[i].init(keys[2 + 2 * i])
            params[f"bypass_{i}"] = self.bypass[i].init(keys[3 + 2 * i])
        return params

    def apply(self, params, x):
        p, grids = x
        xx = jnp.ravel(jnp.asarray(grids[0]))
        tt = jnp.ravel(jnp.asarray(grids[1]))
        nx, nt = xx.shape[0], tt.shape[0]
        if p.ndim == 2:
            field = jnp.broadcast_to(p[:, None, None, :],
                                     (p.shape[0], nx, nt, p.shape[1]))
        elif p.ndim == 4:
            field = p
        else:
            raise ValueError("FNO2D input p must be (in_channels, P) or "
                             f"(in_channels, X, T, P); got ndim={p.ndim}")
        n_p = field.shape[3]
        x_chan = jnp.broadcast_to(xx[None, :, None, None],
                                  (1, nx, nt, n_p)).astype(field.dtype)
        t_chan = jnp.broadcast_to(tt[None, None, :, None],
                                  (1, nx, nt, n_p)).astype(field.dtype)
        v = _pointwise(self.lift, params["lift"],
                       jnp.concatenate([field, x_chan, t_chan], axis=0))
        for i in range(self.depth):
            y = (self.spectral[i].apply(params[f"spectral_{i}"], v)
                 + _pointwise(self.bypass[i], params[f"bypass_{i}"], v))
            v = self.activation(y) if i < self.depth - 1 else y
        out = _pointwise(self.proj, params["proj"], v)     # (out, X, T, P)
        return out[0] if self._out == 1 else out


class SpectralConv3D(Module):
    """3-D Fourier-space channel mixing for fields
    ``(channels, N1, N2, N3, P)``: rFFTn over the three grid axes, keep the
    low-frequency corner blocks — the first ``modes[2]`` rFFT coefficients
    along the last grid axis crossed with positive/negative frequency rows
    along the two full-FFT axes (2^2 = 4 corner blocks; the FNO-3D scheme
    of Li et al. 2021) — mix channels per retained mode triple, truncate
    the rest.

    Four complex weight blocks ``(m1, m2, m3, in, out)`` stored as re/im
    leaves; mode counts are clipped so sign blocks never overlap on small
    grids.
    """

    def __init__(self, in_channels: int, out_channels: int, modes):
        self._in = in_channels
        self._out = out_channels
        m = (modes,) * 3 if isinstance(modes, int) else tuple(modes)
        self.modes = tuple(int(v) for v in m)

    @property
    def in_dim(self):
        return self._in

    @property
    def out_dim(self):
        return self._out

    def init(self, key):
        keys = jax.random.split(key, 8)
        scale = 1.0 / (self._in * self._out)
        shape = (*self.modes, self._in, self._out)
        dtype = default_float()
        u = lambda k: scale * jax.random.uniform(k, shape, dtype, -1.0, 1.0)
        return {f"w{b}_{c}": u(keys[2 * b + (c == "im")])
                for b in range(4) for c in ("re", "im")}

    def apply(self, params, x):
        c, n1, n2, n3, p = x.shape
        xf = jnp.fft.rfftn(x, axes=(1, 2, 3))             # (C, N1, N2, F, P)
        m3 = min(self.modes[2], xf.shape[3])
        pos1 = min(self.modes[0], (n1 + 1) // 2)
        neg1 = min(self.modes[0], n1 // 2)
        pos2 = min(self.modes[1], (n2 + 1) // 2)
        neg2 = min(self.modes[1], n2 // 2)
        # the 4 sign corners along the two full-FFT axes, (slice, kept) pairs
        ax1 = ((slice(0, pos1), pos1), (slice(n1 - neg1, n1), neg1))
        ax2 = ((slice(0, pos2), pos2), (slice(n2 - neg2, n2), neg2))

        yf = jnp.zeros((self._out, n1, n2, xf.shape[3], p), dtype=xf.dtype)
        for b, ((s1, k1), (s2, k2)) in enumerate(
                (i, j) for i in ax1 for j in ax2):
            if k1 == 0 or k2 == 0:
                continue
            w = jax.lax.complex(
                params[f"w{b}_re"][:k1, :k2, :m3].astype(x.dtype),
                params[f"w{b}_im"][:k1, :k2, :m3].astype(x.dtype))
            y = jnp.einsum("ixyzp,xyzio->oxyzp", xf[:, s1, s2, :m3, :], w)
            yf = yf.at[:, s1, s2, :m3, :].set(y)
        return jnp.fft.irfftn(yf, s=(n1, n2, n3), axes=(1, 2, 3))


class FNO3D(Module):
    """3-D Fourier Neural Operator over a uniform tensor grid — the
    `solve_pino_pde` backbone for systems with three independent variables
    (e.g. 2-D + time families):

    ``apply(params, (p, (g1, g2, g3)))`` with ``p`` the parameter columns
    ``(in_channels, P)`` (broadcast over the grid as constant channels) or
    a function-valued field ``(in_channels, N1, N2, N3, P)``, and the three
    uniform grid coordinate arrays appended as coordinate channels.
    Returns ``(N1, N2, N3, P)`` when ``out_channels == 1`` else
    ``(out_channels, N1, N2, N3, P)``.

    Same block structure as `FNO1D`/`FNO2D`: pointwise lift -> depth ×
    ``act(SpectralConv3D + pointwise bypass)`` -> two-layer projection.
    """

    def __init__(self, in_channels: int, width: int = 24, modes=8,
                 depth: int = 4, out_channels: int = 1, activation=gelu):
        self._in = in_channels
        self.width = width
        m = (modes,) * 3 if isinstance(modes, int) else tuple(modes)
        self.modes = tuple(int(v) for v in m)
        self.depth = depth
        self._out = out_channels
        self.activation = activation
        self.lift = Dense(in_channels + 3, width)
        self.spectral = tuple(SpectralConv3D(width, width, self.modes)
                              for _ in range(depth))
        self.bypass = tuple(Dense(width, width) for _ in range(depth))
        self.proj = Chain(Dense(width, width, activation),
                          Dense(width, out_channels))

    @property
    def in_dim(self):
        return self._in

    @property
    def out_dim(self):
        return self._out

    def init(self, key):
        keys = jax.random.split(key, 2 * self.depth + 2)
        params = {"lift": self.lift.init(keys[0]),
                  "proj": self.proj.init(keys[1])}
        for i in range(self.depth):
            params[f"spectral_{i}"] = self.spectral[i].init(keys[2 + 2 * i])
            params[f"bypass_{i}"] = self.bypass[i].init(keys[3 + 2 * i])
        return params

    def apply(self, params, x):
        p, grids = x
        gs = [jnp.ravel(jnp.asarray(g)) for g in grids]
        ns = tuple(g.shape[0] for g in gs)
        if p.ndim == 2:
            field = jnp.broadcast_to(p[:, None, None, None, :],
                                     (p.shape[0], *ns, p.shape[1]))
        elif p.ndim == 5:
            field = p
        else:
            raise ValueError("FNO3D input p must be (in_channels, P) or "
                             f"(in_channels, N1, N2, N3, P); got "
                             f"ndim={p.ndim}")
        n_p = field.shape[4]
        coord = [jnp.broadcast_to(
            g.reshape((1,) + tuple(n if a == i else 1
                                   for i, n in enumerate(ns)) + (1,)),
            (1, *ns, n_p)).astype(field.dtype) for a, g in enumerate(gs)]
        v = _pointwise(self.lift, params["lift"],
                       jnp.concatenate([field, *coord], axis=0))
        for i in range(self.depth):
            y = (self.spectral[i].apply(params[f"spectral_{i}"], v)
                 + _pointwise(self.bypass[i], params[f"bypass_{i}"], v))
            v = self.activation(y) if i < self.depth - 1 else y
        out = _pointwise(self.proj, params["proj"], v)
        return out[0] if self._out == 1 else out


class FNO1D(Module):
    """1-D Fourier Neural Operator over a uniform time grid, with the
    `PINOODE` tuple-input calling convention shared with `DeepONet`:

    ``apply(params, (p, t))`` with ``p`` the parameter columns
    ``(in_channels, P)`` (broadcast over the grid as constant channels) or a
    full function-valued field ``(in_channels, T, P)``, and ``t`` the
    uniform query grid ``(1, T)`` appended as a coordinate channel.  Returns
    ``(T, P)`` when ``out_channels == 1`` (the `DeepONet` layout,
    solvers/pino.py) else ``(out_channels, T, P)``.

    Architecture: pointwise lift to `width` channels -> `depth` blocks of
    ``act(SpectralConv1D + pointwise bypass)`` (no activation after the last
    block) -> two-layer pointwise projection.  Everything is MXU matmuls
    around XLA FFT ops; there is no Python control flow dependent on data.
    """

    def __init__(self, in_channels: int, width: int = 32, modes: int = 16,
                 depth: int = 4, out_channels: int = 1, activation=gelu):
        self._in = in_channels
        self.width = width
        self.modes = modes
        self.depth = depth
        self._out = out_channels
        self.activation = activation
        self.lift = Dense(in_channels + 1, width)
        self.spectral = tuple(SpectralConv1D(width, width, modes)
                              for _ in range(depth))
        self.bypass = tuple(Dense(width, width) for _ in range(depth))
        self.proj = Chain(Dense(width, width, activation),
                          Dense(width, out_channels))

    @property
    def in_dim(self):
        return self._in

    @property
    def out_dim(self):
        return self._out

    def init(self, key):
        keys = jax.random.split(key, 2 * self.depth + 2)
        params = {"lift": self.lift.init(keys[0]),
                  "proj": self.proj.init(keys[1])}
        for i in range(self.depth):
            params[f"spectral_{i}"] = self.spectral[i].init(keys[2 + 2 * i])
            params[f"bypass_{i}"] = self.bypass[i].init(keys[3 + 2 * i])
        return params

    def apply(self, params, x):
        p, t = x
        tt = t[0]                                          # (T,)
        n_t = tt.shape[0]
        if p.ndim == 2:
            field = jnp.broadcast_to(p[:, None, :],
                                     (p.shape[0], n_t, p.shape[1]))
        elif p.ndim == 3:
            field = p
        else:
            raise ValueError("FNO1D input p must be (in_channels, P) or "
                             f"(in_channels, T, P); got ndim={p.ndim}")
        t_chan = jnp.broadcast_to(tt[None, :, None],
                                  (1, n_t, field.shape[2])).astype(field.dtype)
        v = _pointwise(self.lift, params["lift"],
                       jnp.concatenate([field, t_chan], axis=0))
        for i in range(self.depth):
            y = (self.spectral[i].apply(params[f"spectral_{i}"], v)
                 + _pointwise(self.bypass[i], params[f"bypass_{i}"], v))
            v = self.activation(y) if i < self.depth - 1 else y
        out = _pointwise(self.proj, params["proj"], v)     # (out, T, P)
        return out[0] if self._out == 1 else out
