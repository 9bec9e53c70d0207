from .problems import ODEProblem, ODESolution, SDEProblem  # noqa: F401
from .ode import NNODE, ODEPhi, solve_ode  # noqa: F401
from .dae import DAEProblem, NNDAE, solve_dae  # noqa: F401
from .dgm import DeepGalerkin  # noqa: F401
from .pino import PINOODE, PINOODESolution, PINOPhi, solve_pino_ode  # noqa: F401
from .pino_pde import (GaussianRandomField, PINOEnsembleResult, PINOPDE,  # noqa: F401
                       PINOPDESolution, solve_pino_pde,
                       solve_pino_pde_ensemble)
from .adapter import neural_adapter  # noqa: F401
from .sde import NNSDE, SDEPhi, SDEsol, solve_sde  # noqa: F401
from .sde_weak import SDEPINN, solve_sde_weak  # noqa: F401
from .ritz import DeepRitz, discretize_ritz  # noqa: F401
