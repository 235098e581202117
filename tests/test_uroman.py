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


def test_han_pinyin_romanization():
    """Frequent hanzi map to toneless pinyin (the reference's uroman
    produces pinyin; diarize.py:170-174 call site)."""
    assert romanize("中国") == "zhongguo"
    assert romanize("你好") == "nihao"
    assert romanize("学习") == "xuexi"
    assert romanize("北京大学") == "beijingdaxue"
    assert needs_romanization("中国")


def test_han_rare_char_degrades_to_star():
    # ideographs outside the frequent-character table survive
    # romanize() untouched; the aligner dictionary maps them to <star>
    rare = "齉"  # 齉, far outside the top-1500
    assert romanize(rare) == rare


def test_zh_alignment_tokens_are_pinyin():
    """preprocess_text for zh yields pinyin alignment tokens instead of
    <star> wildcards (alignment gets real acoustic anchors)."""
    tokens, starred = preprocess_text("中国 很 好", language="zho")
    assert tokens == [
        "<star>", "zhongguo", "<star>", "hen", "<star>", "hao"
    ]
    assert starred == ["<star>", "中国", "<star>", "很", "<star>", "好"]
