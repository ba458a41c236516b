"""Infrastructure utilities (interpolation, root finding, config, logging)."""
