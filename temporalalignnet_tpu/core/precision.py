"""Re-export of the precision policy (kept separate for import hygiene)."""

from temporalalignnet_tpu.core.config import Precision

__all__ = ["Precision"]
