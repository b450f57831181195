from .frontier import append_frontier, current_frontier  # noqa: F401
