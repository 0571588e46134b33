from aphrodite_tpu.prompt_adapter.request import PromptAdapterRequest

__all__ = ["PromptAdapterRequest"]
