from . import derivatives, quadrature, sampling
