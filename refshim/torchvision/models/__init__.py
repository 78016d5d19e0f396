from . import detection

__all__ = ["detection"]
