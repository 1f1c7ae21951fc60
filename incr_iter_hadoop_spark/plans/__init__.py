from .loopdriver import IterationResult, iterate, l1_state_distance  # noqa: F401
