from .models import PREDEF_MODELS, predefined_absorption  # noqa: F401
