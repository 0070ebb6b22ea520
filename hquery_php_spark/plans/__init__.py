"""Query planning helpers: selector pre-compilation + plan inspection."""

from .compile import CompiledSelector, compile_selector, find_count_df  # noqa: F401
from .explain import explain_str, plan_facts  # noqa: F401
