from .problems import ODEProblem, ODESolution, SDEProblem  # noqa: F401
from .ode import NNODE, ODEPhi, solve_ode  # noqa: F401
from .dae import DAEProblem, NNDAE, solve_dae  # noqa: F401
from .dgm import DeepGalerkin  # noqa: F401
from .pino import PINOODE, PINOODESolution, PINOPhi, solve_pino_ode  # noqa: F401
from .adapter import neural_adapter  # noqa: F401
