from .inspect import explain_str, pushed_filters, wholestage_codegen_spans

__all__ = ["explain_str", "pushed_filters", "wholestage_codegen_spans"]
