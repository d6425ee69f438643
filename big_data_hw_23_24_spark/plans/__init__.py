from .inspect import explain_str, pushed_filters, wholestage_codegen_spans
from .lint import Finding, lint

__all__ = ["explain_str", "pushed_filters", "wholestage_codegen_spans",
           "Finding", "lint"]
