from .history import append_only_delta, latest_per_key
from .keys import carry_forward_keys
from .normalize import explode_with_parent, flatten_structs, pad_columns
from .clean import money, null_if_in, strip_newlines

__all__ = [
    "append_only_delta",
    "latest_per_key",
    "carry_forward_keys",
    "explode_with_parent",
    "flatten_structs",
    "pad_columns",
    "money",
    "null_if_in",
    "strip_newlines",
]
