from .criterion import (
    Targets,
    normalize_targets,
    hungarian_match,
    set_criterion,
    simvg_branch_losses,
)

__all__ = [
    "Targets",
    "normalize_targets",
    "hungarian_match",
    "set_criterion",
    "simvg_branch_losses",
]
