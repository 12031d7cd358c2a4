from die_e_tpu.search.tree import Tree, init_tree, backprop, root_visit_probs
from die_e_tpu.search.alpha import alpha_search, SearchResult
from die_e_tpu.search.simple import simple_search

__all__ = [
    "Tree",
    "init_tree",
    "backprop",
    "root_visit_probs",
    "alpha_search",
    "SearchResult",
    "simple_search",
]
