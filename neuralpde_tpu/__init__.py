"""neuralpde_tpu — TPU-native physics-informed neural network solver suite.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of
SciML/NeuralPDE.jl (reference exports: src/NeuralPDE.jl:90-116).
"""

from .config import default_float, enable_x64
from .logging_utils import LogOptions, TensorBoardLogger, logscalar, logvector
from .symbolic.expr import (
    DepVar, Deriv, Differential, Eq, Expr, Integral, IntegralExpr, Num, Param,
    Sym, abs_, acos, asin, atan, cos, cosh, depvars, erf, exp, expand_derivatives,
    log, parameters, pi, register_primitive, sigmoid, sin, sinh, sqrt,
    substitute, symbols, symbolic_diff, tan, tanh,
)
from .symbolic.system import Domain, Interval, PDESystem, in_domain, infimum, supremum
from .nn.core import (
    Chain, Dense, FourierFeatures, Module, PeriodicEmbedding, SkipConnection,
    Transformed, glorot_normal, glorot_uniform, mlp,
)
from .ops.derivatives import DerivativeEngine, jvp_derivative, numeric_derivative
from .strategies import (
    CausalTraining, GridTraining, QuadratureTraining, QuasiRandomTraining,
    ResidualAdaptiveTraining, StochasticTraining, TrainingStrategy,
    WeightedIntervalTraining, generate_training_sets, get_bounds,
    get_loss_function,
)
from .adaptive import (
    AbstractAdaptiveLoss, GradientScaleAdaptiveLoss,
    InverseDirichletAdaptiveLoss, MiniMaxAdaptiveLoss, NonAdaptiveLoss,
    ReLoBRaLoAdaptiveLoss, SoftAdaptAdaptiveLoss,
)
from .compile.discretize import (
    BayesianPINN, PhysicsInformedNN, Phi, PINNLossFunctions, PINNRepresentation,
    TrainingProblem, discretize, symbolic_discretize,
)
from .compile.lower import (
    build_loss_function, build_residual_function, get_argument,
    get_integration_variables, get_numeric_integral, get_variables,
)
from .parallel.mesh import (
    make_mesh, make_mesh_2d, replicate_params, shard_batch, shard_params_tp,
    use_mesh,
)
from .parallel.ensemble import EnsembleResult, solve_ensemble
from .train import SolveResult, solve, solve_hybrid
from .gauss_newton import (
    build_ode_residual_vector, build_pino_residual_vector,
    build_residual_vector, lm_least_squares, solve_gauss_newton,
    solve_ode_gauss_newton, solve_pino_gauss_newton,
    solve_pino_pde_gauss_newton,
    trust_region_least_squares,
)
from .utils.pytree import vector_to_parameters, parameters_to_vector
from .nn.dgm import DGM, DGMLSTMLayer
from .nn.deeponet import DeepONet, DeepONetPDE
from .nn.fno import FNO1D, FNO2D, FNO3D, SpectralConv1D, SpectralConv2D, SpectralConv3D
from .nn.fbpinn import FBPINN
from .nn.kan import KANLayer, kan
from .nn.separable import SeparableNet, separable_mlp
from .compile.separable import SeparableTraining, build_separable_residual
from .compile.weak import WeakTraining, refine_weak, solve_weak_adaptive
from .solvers import (
    DAEProblem, DeepGalerkin, DeepRitz, GaussianRandomField, NNDAE, NNODE,
    NNSDE, ODEPhi,
    ODEProblem, ODESolution, PINOEnsembleResult, PINOODE, PINOODESolution,
    PINOPDE, PINOPDESolution, SDEPINN, SDEProblem, SDEsol, discretize_ritz,
    neural_adapter, solve_dae, solve_ode, solve_pino_ode, solve_pino_pde,
    solve_pino_pde_ensemble, solve_sde, solve_sde_weak,
)
from .bayesian import (
    BNNODE, BPINNsolution, BPINNstats, ahmc_bayesian_pinn_ode,
    ahmc_bayesian_pinn_pde, ess, mcmc_summarize, solve_bnnode, split_rhat,
)
from .ops.distributions import LogNormal, Normal, Particles, Uniform
from .utils.eltype import EltypeAdaptor, recursive_eltype

__version__ = "0.2.0"
