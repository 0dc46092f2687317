"""Native C++ BPE engine: build, parity with the pure-Python merge loop."""

import os

import numpy as np
import pytest

from leco_tpu.models.tokenizer import make_tiny_tokenizer
from leco_tpu.native import load_bpe_library

native_available = load_bpe_library() is not None

pytestmark = pytest.mark.skipif(
    not native_available, reason="g++ build unavailable"
)


class TestNativeBPE:
    def test_builds(self):
        assert load_bpe_library() is not None

    def test_parity_with_python(self):
        tok = make_tiny_tokenizer(["van", "gogh", "cat", "ears", "a"])
        assert tok._native is not None
        prompts = ["van gogh", "cat ears", "a van", "gogh gogh gogh"]
        native_ids = tok(prompts)
        # force the Python path
        tok._native = None
        tok._bpe_cache.clear()
        python_ids = tok(prompts)
        np.testing.assert_array_equal(native_ids, python_ids)

    def test_unknown_word_falls_back(self):
        tok = make_tiny_tokenizer(["van"])
        # 'zzz' never merges into a single known token; both paths must
        # agree (char-level pieces exist in the tiny vocab)
        a = tok.tokenize("van")
        assert len(a) == 1

    def test_multi_merge_word(self):
        """Words needing several merge rounds agree between engines."""
        tok = make_tiny_tokenizer(["intricate", "painting"])
        assert tok._native is not None
        n = tok.tokenize("intricate painting")
        tok._native = None
        tok._bpe_cache.clear()
        p = tok.tokenize("intricate painting")
        assert n == p
