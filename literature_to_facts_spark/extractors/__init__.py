from .base import DYNAMIC, ExtractorSpec, Sides  # noqa: F401
