"""Tests for the CLIP BPE tokenizer against the standard public vocabulary
asset (read from the reference checkout when present; the vocab is data,
not code)."""

import os

import numpy as np
import pytest

VOCAB = ("/root/reference/coin/modeling/text_encoder/"
         "bpe_simple_vocab_16e6.txt.gz")

pytestmark = pytest.mark.skipif(not os.path.exists(VOCAB),
                                reason="CLIP BPE vocab not available")


@pytest.fixture(scope="module")
def tok():
    from coin_tpu.models.tokenizer import ClipTokenizer
    return ClipTokenizer(VOCAB)


def test_known_clip_token_ids(tok):
    # well-known CLIP token ids for common words
    assert tok.encoder["<|startoftext|>"] == 49406
    assert tok.encoder["<|endoftext|>"] == 49407
    ids = tok.encode("a photo of a cat .")
    # decode back through the reverse vocab
    decoder = {v: k for k, v in tok.encoder.items()}
    text = "".join(decoder[i] for i in ids).replace("</w>", " ").strip()
    assert text == "a photo of a cat ."


def test_tokenize_layout(tok):
    arr = tok.tokenize(["a photo of a car.", "a photo of a person."])
    assert arr.shape == (2, 77)
    assert (arr[:, 0] == 49406).all()
    eot_pos = arr.argmax(axis=1)  # EOT is the max id in each row
    assert all(arr[i, eot_pos[i]] == 49407 for i in range(2))
    # zero padding after EOT
    assert (arr[0, eot_pos[0] + 1:] == 0).all()


def test_prompt_template_structure(tok):
    """The learnable-prompt template layout the text encoder assumes:
    [SOS][a photo of a = 4 tokens][X×4][cls][.][EOT]."""
    prompt = "a photo of a X X X X car."
    ids = tok.tokenize(prompt)[0]
    assert ids[0] == 49406
    # "a photo of a" → 4 single-token words
    words = [tok.encode(w)[0] for w in ["a", "photo", "of", "a"]]
    np.testing.assert_array_equal(ids[1:5], words)
    # class token at position 1+4+4
    assert ids[9] == tok.encode("car")[0]
