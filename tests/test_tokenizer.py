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


# ---------------------------------------------------------------------------
# ftfy-fallback property tests (VERDICT r3 item 6): the non-ftfy `_clean`
# path is what actually runs in this environment (ftfy is not installed).
# Pin (a) the ASCII input class where fallback == ftfy == identity, (b) the
# transcribed transforms on adversarial non-ASCII inputs, and (c) the
# documented divergence (mojibake repair is NOT transcribed).
# ---------------------------------------------------------------------------

def _has_ftfy():
    try:
        import ftfy  # noqa: F401
        return True
    except ImportError:
        return False


def test_clean_identity_on_ascii_prompt_class():
    """Property: on printable-ASCII text with no HTML entities and no
    leading/trailing/multiple whitespace — the class every framework-
    generated prompt belongs to — `_clean` is the identity, matching the
    reference basic_clean+whitespace_clean with ftfy (ftfy.fix_text is the
    identity on such input). Checked exhaustively over the real ensembles."""
    from aa_clip_iqm_tpu.data.registry import CLASS_NAMES
    from aa_clip_iqm_tpu.prompts import class_prompt_sentences
    from aa_clip_iqm_tpu.tokenizer.bpe import _clean, _fallback_fix_text

    checked = 0
    for dataset, classes in CLASS_NAMES.items():
        for cls in classes:
            for group in class_prompt_sentences(dataset, cls):
                for sentence in group:
                    assert sentence.isascii(), sentence
                    assert sentence.isprintable(), sentence
                    assert "&" not in sentence, sentence  # no HTML entities
                    assert _clean(sentence) == sentence
                    assert _fallback_fix_text(sentence) == sentence
                    checked += 1
    assert checked > 100


def test_fallback_transcribed_ftfy_transforms():
    """The fallback applies the transcribed fix_text subset: quote
    uncurling, Latin ligatures, fullwidth->ASCII width folding, NFC. Each
    expected value is ftfy.fix_text's documented output (transcription
    audited against ftfy/fixes.py; cross-checked live when ftfy exists)."""
    from aa_clip_iqm_tpu.tokenizer.bpe import _clean, _fallback_fix_text

    cases = [
        # uncurl_quotes
        ("a photo of the ‘flawless’ widget",
         "a photo of the 'flawless' widget"),
        ("the “damaged” bottle", 'the "damaged" bottle'),
        # fix_latin_ligatures
        ("an oﬀ-center ﬂaw with ﬁssures",
         "an off-center flaw with fissures"),
        # fix_character_width (fullwidth ASCII + ideographic space)
        ("ａ　ｐｈｏｔｏ", "a photo"),
        # NFC normalization (combining acute -> precomposed)
        ("café tile", "café tile"),
        # composition: curly possessive on a fullwidth word
        ("ｗidget’s cap", "widget's cap"),
    ]
    for raw, fixed in cases:
        assert _fallback_fix_text(raw) == fixed, raw
        assert _clean(raw) == fixed or not _has_ftfy() and _clean(raw) == fixed
        if _has_ftfy():
            import ftfy

            assert ftfy.fix_text(raw) == fixed, raw


def test_fallback_tokenizes_curly_apostrophe_like_ftfy():
    """End-to-end consequence: a pasted curly apostrophe must hit the BPE
    \"'s\" suffix rule exactly like the straight quote ftfy would produce —
    identical token ids, not a mojibake token soup."""
    a = tokenize("the widget’s surface")
    b = tokenize("the widget's surface")
    np.testing.assert_array_equal(a, b)


def test_fallback_mojibake_divergence_is_pinned():
    """Documented divergence: the fallback does NOT repair mojibake
    (ftfy.fix_encoding). 'cafÃ©' (UTF-8 'café' mis-decoded as
    Latin-1) stays broken without ftfy and is repaired with it. This test
    states the boundary of the fallback's equivalence claim."""
    from aa_clip_iqm_tpu.tokenizer.bpe import _clean

    mojibake = "cafÃ©"
    if _has_ftfy():
        assert _clean(mojibake) == "café"
    else:
        assert _clean(mojibake) == mojibake  # passes through, still encodable
        ids = tokenize(mojibake)  # must not crash: byte-level BPE covers it
        assert ids.shape == (1, 77)
