from .scalars import (
    bucket_label_col,
    clamp,
    first_word,
    log1p_col,
    un_onehot,
)

__all__ = ["bucket_label_col", "clamp", "first_word", "log1p_col", "un_onehot"]
