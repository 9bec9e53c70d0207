"""Deep Galerkin Method architecture (reference: src/dgm.jl).

LSTM-style gated layer:
  Z = σ₁(Uz x + Wz S + bz);  G = σ₁(Ug x + Wg S + bg)
  R = σ₁(Ur x + Wr S + br);  H = σ₂(Uh x + Wh (S∘R) + bh)
  S' = (1 - G)∘H + Z∘S
(reference: src/dgm.jl:40-48), chained behind an input Dense and closed by an
output Dense (reference: src/dgm.jl:97-115).
"""

from __future__ import annotations

from typing import Callable

import jax

from .core import Dense, Module, glorot_uniform, identity, tanh, zeros_init


class DGMLSTMLayer(Module):
    """(S, x) -> S' gated update; params follow the reference field names
    (reference: src/dgm.jl:17-32)."""

    def __init__(self, in_dims: int, out_dims: int, activation1: Callable,
                 activation2: Callable, *, init_weight=glorot_uniform,
                 init_bias=zeros_init):
        self.in_dims = in_dims
        self.out_dims = out_dims
        self.activation1 = activation1
        self.activation2 = activation2
        self.init_weight = init_weight
        self.init_bias = init_bias

    @property
    def in_dim(self):
        return self.in_dims

    @property
    def out_dim(self):
        return self.out_dims

    def init(self, key):
        ks = jax.random.split(key, 12)
        iw, ib = self.init_weight, self.init_bias
        o, i = self.out_dims, self.in_dims
        return {
            "Uz": iw(ks[0], (o, i)), "Ug": iw(ks[1], (o, i)),
            "Ur": iw(ks[2], (o, i)), "Uh": iw(ks[3], (o, i)),
            "Wz": iw(ks[4], (o, o)), "Wg": iw(ks[5], (o, o)),
            "Wr": iw(ks[6], (o, o)), "Wh": iw(ks[7], (o, o)),
            "bz": ib(ks[8], (o, 1)), "bg": ib(ks[9], (o, 1)),
            "br": ib(ks[10], (o, 1)), "bh": ib(ks[11], (o, 1)),
        }

    def apply(self, params, Sx):
        S, x = Sx
        p = params
        a1, a2 = self.activation1, self.activation2
        Z = a1(p["Uz"] @ x + p["Wz"] @ S + p["bz"])
        G = a1(p["Ug"] @ x + p["Wg"] @ S + p["bg"])
        R = a1(p["Ur"] @ x + p["Wr"] @ S + p["br"])
        H = a2(p["Uh"] @ x + p["Wh"] @ (S * R) + p["bh"])
        return (1.0 - G) * H + Z * S


class DGM(Module):
    """Full DGM network: x -> Dense -> L gated layers -> Dense
    (reference: src/dgm.jl:97-115)."""

    def __init__(self, in_dims: int, out_dims: int, modes: int, layers: int,
                 activation1: Callable = tanh, activation2: Callable = tanh,
                 out_activation: Callable = identity):
        self.in_dims = in_dims
        self.out_dims = out_dims
        self.input_layer = Dense(in_dims, modes, activation1)
        self.lstm_layers = [DGMLSTMLayer(in_dims, modes, activation1, activation2)
                            for _ in range(layers)]
        self.output_layer = Dense(modes, out_dims, out_activation)

    @property
    def in_dim(self):
        return self.in_dims

    @property
    def out_dim(self):
        return self.out_dims

    def init(self, key):
        ks = jax.random.split(key, len(self.lstm_layers) + 2)
        params = {"input": self.input_layer.init(ks[0]),
                  "output": self.output_layer.init(ks[-1])}
        for i, (l, k) in enumerate(zip(self.lstm_layers, ks[1:-1])):
            params[f"lstm_{i}"] = l.init(k)
        return params

    def apply(self, params, x):
        S = self.input_layer.apply(params["input"], x)
        for i, l in enumerate(self.lstm_layers):
            S = l.apply(params[f"lstm_{i}"], (S, x))
        return self.output_layer.apply(params["output"], S)
