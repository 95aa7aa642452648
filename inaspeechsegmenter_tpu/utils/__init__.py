from .timing import StageTimers, jax_trace

__all__ = ["StageTimers", "jax_trace"]
