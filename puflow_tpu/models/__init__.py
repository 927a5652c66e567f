"""Model families: discrete (Glow-style) and continuous (CNF) interpolation flows."""

from puflow_tpu.models import discrete  # noqa: F401
