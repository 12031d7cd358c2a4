from die_e_tpu.search.tree import (
    Tree,
    init_tree,
    backprop,
    backprop_path,
    root_q_values,
    root_visit_probs,
)
from die_e_tpu.search.alpha import alpha_search, get_next_move, SearchResult
from die_e_tpu.search.simple import simple_search, simple_search_hosted

__all__ = [
    "Tree",
    "init_tree",
    "backprop",
    "backprop_path",
    "root_q_values",
    "root_visit_probs",
    "alpha_search",
    "get_next_move",
    "SearchResult",
    "simple_search",
    "simple_search_hosted",
]
