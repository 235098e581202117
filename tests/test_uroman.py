"""Romanization tables/algorithms in align.uroman, and their hookup
into the forced-alignment text preprocessing (align.text)."""

import pytest

from whisper_nemo_tpu.align.text import normalize_word, preprocess_text
from whisper_nemo_tpu.align.uroman import needs_romanization, romanize


@pytest.mark.parametrize(
    "src,expected",
    [
        # Cyrillic (accented Москва́ exercises mark stripping)
        ("привет", "privet"),
        ("Москва́", "moskva"),
        ("Київ", "kiyiv"),
        ("щука", "shchuka"),
        # Greek (accents stripped, ου digraph)
        ("καλημέρα", "kalimera"),
        ("μουσική", "mousiki"),
        # Hebrew / Arabic (consonantal)
        ("שלום", "shlvm"),
        ("مرحبا", "mrhba"),
        # kana: digraphs, gemination, long vowels, katakana
        ("こんにちは", "konnichiha"),
        ("きょう", "kyou"),
        ("しゃしん", "shashin"),
        ("がっこう", "gakkou"),
        ("トーキョー", "tookyoo"),
        ("ジャズ", "jazu"),
        # Hangul Revised Romanization (algorithmic decomposition)
        ("안녕하세요", "annyeonghaseyo"),
        ("한국", "hanguk"),
        ("서울", "seoul"),
        # Devanagari: virama kills the inherent vowel, matras apply
        ("नमस्ते", "namaste"),
        ("भारत", "bhaarat"),
        # Latin passes through
        ("hello", "hello"),
    ],
)
def test_romanize(src, expected):
    assert romanize(src) == expected


def test_needs_romanization():
    assert needs_romanization("привет")
    assert needs_romanization("日本 こんにちは")  # kana triggers
    assert not needs_romanization("café naïve")
    assert not needs_romanization("hello123")


def test_normalize_word_romanizes():
    assert normalize_word("Привет!") == "privet"
    assert normalize_word("café") == "cafe"  # diacritic path unchanged
    assert normalize_word("안녕하세요") == "annyeonghaseyo"


def test_preprocess_text_multiscript():
    tokens, starred = preprocess_text("hello привет 서울")
    assert tokens == [
        "<star>", "hello", "<star>", "privet", "<star>", "seoul"
    ]
    assert starred == [
        "<star>", "hello", "<star>", "привет", "<star>", "서울"
    ]


def test_han_passthrough_degrades_to_star():
    # unmapped ideographs survive romanize() untouched; normalize_word
    # then drops them (non-\w punctuation is kept out by regex, CJK
    # word chars remain) — the aligner dictionary maps them to <star>
    assert romanize("中国") == "中国"
