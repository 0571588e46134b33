"""N-gram prompt-lookup proposer.

Reference: aphrodite/spec_decode/ngram_worker.py (NGramWorker): match the
longest recent n-gram (n in [min, max]) against earlier occurrences in
the token history; propose the tokens that followed the match. Pure host
logic — runs in microseconds per sequence.
"""

from typing import List, Optional


def propose_ngram(
    token_ids: List[int],
    num_speculative_tokens: int,
    ngram_max: int = 4,
    ngram_min: int = 1,
) -> List[int]:
    """Returns up to `num_speculative_tokens` proposed continuation
    tokens ([] when no n-gram match is found)."""
    n_total = len(token_ids)
    if n_total < ngram_min + 1:
        return []
    for n in range(min(ngram_max, n_total - 1), ngram_min - 1, -1):
        tail = token_ids[-n:]
        # Scan right-to-left for the most recent earlier occurrence.
        for start in range(n_total - n - 1, -1, -1):
            if token_ids[start:start + n] == tail:
                follow = token_ids[start + n:start + n +
                                   num_speculative_tokens]
                if follow:
                    return follow
                break
    return []
