"""Tokenizer loading (reference: aphrodite/transformers_utils/tokenizer.py).

Thin wrapper over HF AutoTokenizer; local directories only (no network in
this environment). Provides the eos/bos lookups the engine needs.
"""

from typing import Optional

from aphrodite_tpu.common.logger import init_logger

logger = init_logger(__name__)


def get_tokenizer(
    tokenizer_name: str,
    trust_remote_code: bool = False,
    revision: Optional[str] = None,
):
    import os

    from aphrodite_tpu.transformers_utils.tekken import (TekkenTokenizer,
                                                         find_tekken_file)

    # Mistral-format checkpoints ship tekken.json instead of an HF
    # tokenizer (reference tokenizers/mistral.py); parse it natively.
    if os.path.isdir(tokenizer_name):
        tk = find_tekken_file(tokenizer_name)
        if tk is not None and not os.path.exists(
                os.path.join(tokenizer_name, "tokenizer_config.json")):
            return TekkenTokenizer(tk)
    elif tokenizer_name.endswith("tekken.json"):
        return TekkenTokenizer(tokenizer_name)

    from transformers import AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(
        tokenizer_name,
        trust_remote_code=trust_remote_code,
        revision=revision,
        use_fast=True,
    )
    if tokenizer.eos_token_id is None:
        logger.warning("tokenizer has no eos_token_id; generation will only "
                       "stop on max_tokens/stop strings")
    return tokenizer
