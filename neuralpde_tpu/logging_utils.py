"""Logging hook protocol (reference: src/pinn_types.jl:7-46,
ext/NeuralPDETensorBoardLoggerExt.jl).

`logscalar`/`logvector` dispatch on the logger object: any logger exposing
`log_scalar(name, value, step)` works; `TensorBoardLogger` writes TF event
files (via tensorboardX when available, else a no-op with a warning).
Loggers are invoked host-side from the train loop at `log_frequency`.
"""

from __future__ import annotations

import warnings


class LogOptions:
    def __init__(self, log_frequency: int = 50):
        self.log_frequency = log_frequency


def logscalar(logger, value: float, name: str, step: int) -> None:
    if logger is None:
        return
    fn = getattr(logger, "log_scalar", None)
    if fn is not None:
        fn(name, float(value), int(step))


def logvector(logger, values, name: str, step: int) -> None:
    if logger is None:
        return
    for i, v in enumerate(values):
        logscalar(logger, v, f"{name}/{i + 1}", step)


class TensorBoardLogger:
    """TensorBoard backend (tensorboardX), mirroring the reference's
    TBLogger extension behavior of per-element scalar series."""

    def __init__(self, logdir: str):
        self.logdir = logdir
        try:
            from tensorboardX import SummaryWriter  # type: ignore

            self._writer = SummaryWriter(logdir)
        except Exception:  # pragma: no cover - env without tensorboardX
            warnings.warn("tensorboardX not available; TensorBoardLogger is a no-op")
            self._writer = None

    def log_scalar(self, name: str, value: float, step: int) -> None:
        if self._writer is not None:
            self._writer.add_scalar(name, value, step)

    def flush(self):
        if self._writer is not None:
            self._writer.flush()

    def close(self):
        if self._writer is not None:
            self._writer.close()
