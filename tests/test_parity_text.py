"""Golden parity: rs_ov text transformer vs reference TextTransformer."""

import numpy as np
import torch

import jax.numpy as jnp

from ref_shim import load_reference_transformer
from rs_ov.core.checkpoint import text_params_from_state_dict
from rs_ov.core.config import TextConfig
from rs_ov.text.encoder import text_forward


def test_text_transformer_parity():
    tmod = load_reference_transformer()
    torch.manual_seed(1)
    ref = tmod.TextTransformer(context_length=16, vocab_size=100, width=32,
                               heads=2, layers=3, output_dim=24)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = text_params_from_state_dict(sd, prefix="")
    cfg = TextConfig(context_length=16, vocab_size=100, width=32, heads=2,
                     layers=3, output_dim=24)

    rng = np.random.RandomState(0)
    ids = np.zeros((5, 16), dtype=np.int64)
    for i in range(5):
        n = rng.randint(3, 16)
        ids[i, :n] = rng.randint(1, 99, size=n)
        ids[i, n - 1] = 99  # EOT = highest id (argmax pooling target)

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(ids)).numpy()
    got = np.asarray(text_forward(params, jnp.asarray(ids.astype(np.int32)), cfg))
    np.testing.assert_allclose(got, ref_out, atol=1e-5, rtol=1e-4)


def test_tokenizer_known_values():
    """BPE sanity: round-trip and the canonical 'a photo of a' prefix."""
    from rs_ov.text.tokenizer import SimpleTokenizer

    tok = SimpleTokenizer()
    assert tok.vocab_size == 49408
    assert tok.sot_token_id == 49406
    assert tok.eot_token_id == 49407

    ids = tok("a photo of a cat.")
    assert ids.shape == (1, 77)
    assert ids[0, 0] == 49406
    # decode (excluding specials) round-trips the text
    body = [int(t) for t in ids[0] if t not in (0, 49406, 49407)]
    assert tok.decode(body).strip() == "a photo of a cat ."

    # 'a photo of a' must be common single-token words in CLIP's vocab
    ids2 = tok("a diagram")[0]
    assert ids2[1] == 320  # 'a</w>' is id 320 in the CLIP BPE vocab

    # truncation forces EOT into the last slot
    long = tok(" ".join(["word"] * 200))[0]
    assert long[-1] == 49407


def test_tokenizer_matches_hf_clip():
    """Cross-check against transformers' CLIPTokenizer built from our table."""
    import gzip
    import json
    import tempfile

    import pytest

    try:
        from transformers import CLIPTokenizer
    except Exception:
        pytest.skip("transformers unavailable")

    from rs_ov.text.tokenizer import SimpleTokenizer, _BPE_PATH

    tok = SimpleTokenizer()
    with tempfile.TemporaryDirectory() as td:
        merges = gzip.open(_BPE_PATH).read().decode("utf-8").split("\n")
        merges = merges[1:49152 - 256 - 2 + 1]
        with open(f"{td}/merges.txt", "w") as f:
            f.write("#version: 0.2\n")
            f.write("\n".join(merges) + "\n")
        # HF uses <|startoftext|>/<|endoftext|> names for the same ids
        vocab = dict(tok.encoder)
        vocab["<|startoftext|>"] = vocab.pop("<start_of_text>")
        vocab["<|endoftext|>"] = vocab.pop("<end_of_text>")
        with open(f"{td}/vocab.json", "w") as f:
            json.dump(vocab, f)
        hf = CLIPTokenizer(f"{td}/vocab.json", f"{td}/merges.txt")

        samples = [
            "a photo of a building.",
            "itap of the low vegetation, impervious surface!",
            "satellite imagery of roads & cars 123",
            "THE Weird-Looking tree?",
        ]
        for s in samples:
            assert tok.encode(s) == hf.encode(s, add_special_tokens=False), s


class TestReductionMasks:
    """Reduction-mask tokenizers (reference tokenizer.py:274-394)."""

    def _tok(self, kind):
        from rs_ov.text.tokenizer import SimpleTokenizer
        return SimpleTokenizer(context_length=12, reduction_mask=kind)

    def test_short_text_unchanged(self):
        from rs_ov.text.tokenizer import SimpleTokenizer
        plain = SimpleTokenizer(context_length=12)
        for kind in ("simple", "random", "shuffle"):
            out = self._tok(kind)("a dog")
            np.testing.assert_array_equal(out, plain("a dog"))

    def test_random_keeps_order(self):
        tok = self._tok("random")
        long = "the quick brown fox jumps over the lazy sleeping dog again today"
        full = tok.encode(long)
        out = tok(long)[0]
        assert out[0] == tok.sot_token_id
        inner = [t for t in out[1:] if t not in (0, tok.eot_token_id)]
        assert len(inner) == 10  # context 12 - sot - eot
        # kept tokens are an ordered subsequence of the full encoding
        it = iter(full)
        assert all(any(t == u for u in it) for t in inner)

    def test_simple_keeps_contiguous_block(self):
        tok = self._tok("simple")
        long = "the quick brown fox jumps over the lazy sleeping dog again today"
        full = tok.encode(long)
        inner = [t for t in tok(long)[0][1:] if t not in (0, tok.eot_token_id)]
        joined = ",".join(map(str, full))
        assert ",".join(map(str, inner)) in joined

    def test_invalid_kind_raises(self):
        import pytest
        with pytest.raises(ValueError, match="reduction mask"):
            self._tok("nope")
