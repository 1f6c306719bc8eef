from .text import SQL_TOKEN_PATTERN, tokenize_expr  # noqa: F401
