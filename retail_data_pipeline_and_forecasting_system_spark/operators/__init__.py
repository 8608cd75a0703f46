from .depletion import greedy_inventory_depletion  # noqa: F401
