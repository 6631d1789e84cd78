from .logquery import LogQuery

__all__ = ["LogQuery"]
