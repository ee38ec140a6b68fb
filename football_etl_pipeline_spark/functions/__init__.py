from .numeric import dsum, davg, dmul

__all__ = ["dsum", "davg", "dmul"]
