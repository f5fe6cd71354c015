from .pipeline import Pipeline, Stage  # noqa: F401
