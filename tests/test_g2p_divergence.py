"""Bound the no-espeak G2P path's divergence from gold IPA.

The reference always phonemizes through espeak
(/root/reference/TTS/tts/utils/text/__init__.py:26-58); this image has no
espeak, so the lexicon+rules fallback is what actually runs. This fixture
pins a gold broad-IPA transcription (en-US) for a sentence set and asserts
the fallback's phone error rate stays bounded — a regression gate for
lexicon/rule changes, and a measured statement of fallback quality.

Comparison ignores stress marks, length marks, and spaces (broad match)."""

import re

import pytest

from tts_tpu.text.phonemize import text2phone

# (sentence, gold broad IPA). Gold is hand-curated General-American.
GOLD = [
    ("the quick brown fox jumps over the lazy dog",
     "ðʌkwɪkbɹaʊnfɑksdʒʌmpsoʊvɚðʌleɪzidɔɡ"),
    ("one of the two women said nothing",
     "wʌnʌvðʌtuwɪmʌnsɛdnʌθɪŋ"),
    ("he was the first to come and the last to leave",
     "hiwɑzðʌfɚsttukʌmændðʌlæsttuliv"),
    ("she heard the children laugh in the house",
     "ʃihɚdðʌtʃɪldɹʌnlæfɪnðʌhaʊs"),
    ("there are many people in the world today",
     "ðɛɹɑɹmɛnipipʌlɪnðʌwɚldtʌdeɪ"),
    ("i thought you knew the answer",
     "aɪθɔtjunuðʌænsɚ"),
    ("they found the money under the water",
     "ðeɪfaʊndðʌmʌniʌndɚðʌwɔtɚ"),
    ("my mother and father live in a small house",
     "maɪmʌðɚændfɑðɚlɪvɪnʌsmɔlhaʊs"),
    ("we should go home before night",
     "wiʃʊdɡoʊhoʊmbɪfɔɹnaɪt"),
    ("what time does the machine start",
     "wʌttaɪmdʌzðʌmʌʃinstɑɹt"),
    ("nothing is more important than good friends",
     "nʌθɪŋɪzmɔɹɪmpɔɹtʌntðænɡʊdfɹɛndz"),
    ("the young woman wrote a great book",
     "ðʌjʌŋwʊmʌnɹoʊtʌɡɹeɪtbʊk"),
    ("he spoke in a quiet voice",
     "hispoʊkɪnʌkwaɪʌtvɔɪs"),
    ("it was a beautiful morning in early spring",
     "ɪtwɑzʌbjutʌfʌlmɔɹnɪŋɪnɚlispɹɪŋ"),
    ("seven hundred thousand people heard the speech",
     "sɛvʌnhʌndɹʌdθaʊzʌndpipʌlhɚdðʌspitʃ"),
    ("could you please tell me where the doctor is",
     "kʊdjupliztɛlmiwɛɹðʌdɑktɚɪz"),
    ("the old castle stood on a high mountain",
     "ðioʊldkæsʌlstʊdɑnʌhaɪmaʊntʌn"),
    ("she asked a very simple question",
     "ʃiæsktʌvɛɹisɪmpʌlkwɛstʃʌn"),
    ("both of them walked through the door together",
     "boʊθʌvðɛmwɔktθɹuðʌdɔɹtʌɡɛðɚ"),
    ("this is the second time this month",
     "ðɪsɪzðʌsɛkʌndtaɪmðɪsmʌnθ"),
    ("the business opened its doors at eight",
     "ðʌbɪznʌsoʊpʌndɪtsdɔɹzæteɪt"),
    ("i never doubt an honest answer",
     "aɪnɛvɚdaʊtænɑnʌstænsɚ"),
    ("her daughter caught the ball with one hand",
     "hɚdɔtɚkɔtðʌbɔlwɪθwʌnhænd"),
    ("they bought enough food for the whole week",
     "ðeɪbɔtɪnʌffudfɔɹðʌhoʊlwik"),
    ("the island lies far from the coast",
     "ðiaɪlʌndlaɪzfɑɹfɹʌmðʌkoʊst"),
    ("listen to the sound of the ocean",
     "lɪsʌntuðʌsaʊndʌvðioʊʃʌn"),
    ("every child should learn to read and write",
     "ɛvɚitʃaɪldʃʊdlɚntuɹidændɹaɪt"),
    ("he broke his arm last wednesday",
     "hibɹoʊkhɪzɑɹmlæstwɛnzdeɪ"),
    ("the weather turned rough in february",
     "ðʌwɛðɚtɚndɹʌfɪnfɛbjʌwɛɹi"),
    ("she chose the most comfortable chair",
     "ʃitʃoʊzðʌmoʊstkʌmftɚbʌltʃɛɹ"),
]

_STRIP = re.compile(r"[ˈˌːˑ\s]")


def _norm(ipa: str) -> str:
    return _STRIP.sub("", ipa)


def _edit_distance(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fallback_phone_error_rate_bounded():
    total_err = total_len = 0
    worst = (0.0, "")
    for sent, gold in GOLD:
        got = _norm(text2phone(sent, backend="rules"))
        ref = _norm(gold)
        err = _edit_distance(got, ref)
        total_err += err
        total_len += len(ref)
        per = err / len(ref)
        if per > worst[0]:
            worst = (per, sent)
        # no single sentence may be mostly wrong (worst measured: 0.154)
        assert per < 0.30, (sent, got, ref, per)
    overall = total_err / total_len
    # measured 0.033 with the core lexicon (bare rules: 0.383 — the lexicon
    # is a 12x divergence reduction); gate with headroom so genuine
    # regressions (lexicon/rule breakage) fail loudly
    assert overall < 0.10, (overall, worst)


def test_lexicon_beats_bare_rules():
    """The lexicon path must strictly improve on bare letter-to-sound for
    the gold set (guards against lookup wiring silently breaking)."""
    from tts_tpu.text.phonemize import _rule_g2p_word, PUNCT_RE

    def bare(text):
        parts = PUNCT_RE.split(text)
        return "".join(p if PUNCT_RE.fullmatch(p) else _rule_g2p_word(p)
                       for p in parts)

    err_lex = err_bare = 0
    for sent, gold in GOLD:
        ref = _norm(gold)
        err_lex += _edit_distance(_norm(text2phone(sent, backend="rules")),
                                  ref)
        err_bare += _edit_distance(_norm(bare(sent)), ref)
    assert err_lex < err_bare


def test_morphology_derivations():
    from tts_tpu.text.phonemize import _lexicon_morph
    assert _lexicon_morph("walked") == _lexicon_morph("walk") + "t"
    assert _lexicon_morph("asking") == _lexicon_morph("ask") + "ɪŋ"
    assert _lexicon_morph("days").endswith("z")
    assert _lexicon_morph("books").endswith("s")
    assert _lexicon_morph("quickly") is None  # 'quick' not in core lexicon
