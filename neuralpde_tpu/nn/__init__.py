from .core import (
    Chain, Dense, FourierFeatures, Module, PeriodicEmbedding, SkipConnection,
    Transformed, gelu,
    glorot_normal, glorot_uniform, identity, mlp, relu, sigmoid, sin,
    softplus, swish, tanh, zeros_init,
)
from .adapters import FlaxAdapter, HaikuAdapter  # noqa: F401
from .fno import FNO1D, FNO2D, FNO3D, SpectralConv1D, SpectralConv2D, SpectralConv3D  # noqa: F401
from .separable import SeparableNet, separable_mlp  # noqa: F401
