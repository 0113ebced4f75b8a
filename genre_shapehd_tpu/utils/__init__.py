from .printing import str_stage, str_verbose, str_warning, str_error

__all__ = ["str_stage", "str_verbose", "str_warning", "str_error"]
