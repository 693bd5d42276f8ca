from .normalize import normalize_text, normalize_text_expr

__all__ = ["normalize_text", "normalize_text_expr"]
