"""Prompt-adapter (soft prompt) request
(reference: aphrodite/prompt_adapter/request.py)."""

from dataclasses import dataclass


@dataclass(frozen=True)
class PromptAdapterRequest:
    prompt_adapter_name: str
    prompt_adapter_id: int
    prompt_adapter_local_path: str

    def __post_init__(self):
        if self.prompt_adapter_id < 1:
            raise ValueError("prompt_adapter_id must be >= 1")
