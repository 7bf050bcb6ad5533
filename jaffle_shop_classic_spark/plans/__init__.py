from .registry import Project, ModelContext, ModelSpec, model

__all__ = ["Project", "ModelContext", "ModelSpec", "model"]
