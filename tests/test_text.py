"""Text frontend tests (≙ reference tests/test_text_processing.py tier)."""

import numpy as np

from tts_tpu import text
from tts_tpu.text import cleaners, symbols
from tts_tpu.text.cmudict import CMUDict, arpabet_to_ipa
from tts_tpu.text.numbers import normalize_numbers, number_to_words
from tts_tpu.text.phonemize import text2phone


class TestNumbers:
    def test_cardinals(self):
        assert number_to_words(0) == "zero"
        assert number_to_words(17) == "seventeen"
        assert number_to_words(42) == "forty two"
        assert number_to_words(100) == "one hundred"
        assert number_to_words(1234567) == \
            "one million two hundred thirty four thousand five hundred sixty seven"

    def test_normalize(self):
        assert normalize_numbers("I have 3 cats") == "I have three cats"
        assert normalize_numbers("$5.50 please") == "five dollars, fifty cents please"
        assert normalize_numbers("the 2nd time") == "the second time"
        assert normalize_numbers("1,000 miles") == "one thousand miles"
        assert normalize_numbers("3.14 pie") == "three point one four pie"
        assert normalize_numbers("in 1984 and") == "in nineteen eighty four and"
        assert normalize_numbers("in 2003") == "in two thousand three"


class TestCleaners:
    def test_english(self):
        out = cleaners.english_cleaners("Dr.  Smith   bought 2 apples!")
        assert out == "doctor smith bought two apples!"

    def test_ascii_transliteration(self):
        assert cleaners.convert_to_ascii("café œuvre ß") == "cafe oeuvre ss"

    def test_basic(self):
        assert cleaners.basic_cleaners("  Hello\tWORLD ") == "hello world"

    def test_phoneme_cleaners(self):
        assert cleaners.phoneme_cleaners("Mr. Jones & son (2)") == \
            "mister Jones and son two"


class TestSequences:
    def test_text_roundtrip(self):
        seq = text.text_to_sequence("hello world!", ["basic_cleaners"])
        assert len(seq) == len("hello world!")
        assert text.sequence_to_text(seq) == "hello world!"

    def test_unknown_symbols_dropped(self):
        seq = text.text_to_sequence("héllo", ["basic_cleaners"])
        assert text.sequence_to_text(seq) == "hllo"

    def test_phoneme_sequence(self):
        seq = text.phoneme_to_sequence("hello world", ["phoneme_cleaners"],
                                       backend="rules")
        assert len(seq) > 0
        decoded = text.sequence_to_text(seq, use_phonemes=True)
        assert "l" in decoded  # 'hello' keeps an l in any g2p

    def test_eos_bos(self):
        seq = text.phoneme_to_sequence("hi", ["phoneme_cleaners"],
                                       enable_eos_bos=True, backend="rules")
        ptable = {s: i for i, s in enumerate(symbols.phonemes)}
        assert seq[0] == ptable[symbols.bos]
        assert seq[-1] == ptable[symbols.eos]

    def test_arpabet_passthrough(self):
        seq = text.text_to_sequence("say {HH AH0 L OW1} now", ["basic_cleaners"])
        assert len(seq) > 8
        seq_p = text.phoneme_to_sequence("{HH AH0 L OW1}", ["basic_cleaners"],
                                         backend="rules")
        assert len(seq_p) >= 4

    def test_custom_charset(self):
        syms, phs = symbols.make_symbols("abc ", "xyz")
        assert syms[:3] == ["_", "~", "^"]
        assert "@x" in syms
        assert len(phs) > 3
        table = {s: i for i, s in enumerate(syms)}
        seq = text.text_to_sequence("abc cab", ["basic_cleaners"], tp=table)
        assert len(seq) == 7

    def test_ids_in_range(self):
        seq = text.phoneme_to_sequence(
            "The quick brown fox, jumps over 2 lazy dogs!",
            ["phoneme_cleaners"], enable_eos_bos=True, backend="rules")
        n = text.num_symbols(use_phonemes=True)
        assert np.asarray(seq).min() >= 0
        assert np.asarray(seq).max() < n


class TestPhonemize:
    def test_punctuation_preserved(self):
        out = text2phone("hello, world!", backend="rules")
        assert "," in out and "!" in out

    def test_deterministic(self):
        a = text2phone("determinism matters", backend="rules")
        b = text2phone("determinism matters", backend="rules")
        assert a == b

    def test_all_ipa_in_inventory(self):
        out = text2phone("she thought the church might change everything",
                         backend="rules")
        inventory = set(symbols.phonemes) | set(" ")
        for ch in out:
            assert ch in inventory, f"{ch!r} not in phoneme inventory"


class TestCMUDict:
    LINES = [
        "HELLO  HH AH0 L OW1",
        "HELLO(1)  HH EH0 L OW1",
        "WORLD  W ER1 L D",
        ";;; comment",
    ]

    def test_parse_and_lookup(self):
        d = CMUDict(self.LINES)
        assert len(d) == 2
        assert d.lookup("hello") == ["HH AH0 L OW1", "HH EH0 L OW1"]
        assert d.lookup("world") == ["W ER1 L D"]
        assert d.lookup("missing") is None

    def test_keep_ambiguous_false(self):
        d = CMUDict(self.LINES, keep_ambiguous=False)
        assert d.lookup("hello") is None

    def test_get_arpabet(self):
        d = CMUDict(self.LINES)
        assert CMUDict.get_arpabet("world!", d) == "{W ER1 L D}!"
        assert CMUDict.get_arpabet("unknown", d) == "unknown"

    def test_arpabet_to_ipa(self):
        ipa = arpabet_to_ipa(["HH", "AH0", "L", "OW1"])
        assert ipa == "hʌlˈoʊ"
