"""Tokenizer parity: known CLIP token ids + framing invariants."""
import numpy as np

from aa_clip_iqm_tpu.tokenizer import ClipTokenizer, tokenize


def test_known_token_ids():
    # Ground-truth ids from the published OpenAI CLIP tokenizer.
    out = tokenize("a photo of a cat.")
    assert out.shape == (1, 77)
    ids = out[0][out[0] != 0].tolist()
    assert ids[0] == 49406 and ids[-1] == 49407  # SOT / EOT
    assert ids == [49406, 320, 1125, 539, 320, 2368, 269, 49407]


def test_sot_eot_and_padding():
    out = tokenize(["the dark bottle.", "a damaged screw."])
    assert out.shape == (2, 77)
    for row in out:
        nz = row[row != 0]
        assert nz[0] == 49406 and nz[-1] == 49407
        # zero padding after EOT
        eot_pos = int(np.argmax(row))
        assert (row[eot_pos + 1:] == 0).all()


def test_roundtrip_decode():
    # CLIP decode renders each word-final token with a trailing space
    # (punctuation is its own word), so test re-encode stability instead of
    # literal string equality.
    tok = ClipTokenizer()
    for text in [
        "a photo of a damaged metal nut which has four notched edges.",
        "the gray carpet.",
        "oval white pill with small red speckles and the letters 'ff' engraved",
    ]:
        ids = tok.encode(text)
        assert tok.encode(tok.decode(ids)) == ids
        assert tok.decode(ids).replace(" ", "") == text.replace(" ", "")


def test_case_and_whitespace_normalization():
    a = tokenize("A   Photo of   a CAT.")
    b = tokenize("a photo of a cat.")
    np.testing.assert_array_equal(a, b)


def test_prompt_ensemble_tokenizes():
    from aa_clip_iqm_tpu.prompts import class_prompt_sentences

    groups = class_prompt_sentences("MVTec", "bottle")
    assert len(groups[0]) == 6   # 3 normal states x 2 templates
    assert len(groups[1]) == 10  # 5 abnormal states x 2 templates
    toks = tokenize(groups[0] + groups[1])
    assert toks.shape == (16, 77)
