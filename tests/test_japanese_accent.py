"""Japanese G2P golden tests: pitch accent, devoicing, kanji coverage.

The reference emits ↑/↓ pitch marks and devoiced I/U phonemes from
pyopenjtalk full-context labels (utils/g2p/japanese.py:74-113); both are in
the trained 69-symbol vocab. pyopenjtalk is absent from this image, so
these goldens pin the embedded-lexicon pipeline to hand-checked
Tokyo-accent renderings (NHK-style accent types) with the reference's
exact mark-placement rules:

  ↓ after the accent-nucleus mora when another mora follows in the phrase
  ↑ after mora 1 of a multi-mora phrase whose accent type isn't 1
  space between accent phrases; I/U = devoiced vowels (→ i*/ɯ* in IPA)
"""

import re

import pytest

from vallex_tpu.frontend.japanese import (
    japanese_to_ipa2,
    japanese_to_romaji_with_accent,
    number_to_kana,
    _number_with_counter,
)

# (text, romaji-with-accent golden)
GOLDENS = [
    ("こんにちは。", "ko↑Nniʧiwa."),
    ("おはようございます。", "o↑hayougozaima↓sU."),
    ("ありがとうございました。", "a↑rigatougozaima↓ʃIta."),
    ("私は学生です。", "wa↑taʃiwa ga↑kUseide↓sU."),
    ("東京へ行きます。", "to↑ukyoue i↑kima↓sU."),
    ("昨日映画を見ました。", "ki↑no↓u e↓igao mi↑ma↓ʃIta."),
    ("日本語を勉強しています。", "ni↑hoNgoo be↑NkyouʃIteima↓sU."),
    ("お名前は何ですか。", "o↑namaewa na↓nidesUka."),
    ("これは私の本です。", "ko↑rewa wa↑taʃino ho↓NdesU."),
    ("駅はどこですか。", "e↓kiwa do↓kodesUka."),
    ("猫が好きです。", "ne↓koga sU↑ki↓desU."),
    ("夜ご飯を作りました。", "yo↓ru go↓haNo tsU↑kurima↓ʃIta."),
    ("友達と遊びました。", "to↑modaʧIto a↑sobima↓ʃIta."),
    ("電車で会社に行きます。", "de↑Nʃade ka↑iʃani i↑kima↓sU."),
    ("冬は雪が降ります。", "fu↑yu↓wa yu↑ki↓ga fu↑rima↓sU."),
    ("少し疲れました。", "sU↑ko↓ʃi tsU↑karema↓ʃIta."),
    ("もう一度言ってください。", "mo↑u i↑ʧido i↑Qte ku↑dasa↓i."),
    ("ゆっくり話してください。", "yu↑Qku↓ri ha↑na↓ʃIte ku↑dasa↓i."),
    ("全然分かりません。", "ze↑NzeN wa↑karimase↓N."),
    ("大丈夫ですか。", "da↑ijo↓ubudesUka."),
    ("水をください。", "mi↑zuo ku↑dasa↓i."),
    ("窓を開けてください。", "ma↓doo a↑kete ku↑dasa↓i."),
    ("新しい靴を買いました。", "a↑taraʃi↓i kU↑tsu↓o ka↑ima↓ʃIta."),
    ("頭が痛いです。", "a↑tama↓ga i↑ta↓idesU."),
    ("風邪を引きました。", "ka↑zeo hI↑kima↓ʃIta."),
    ("いくらですか。", "i↑kuradesUka."),
    ("これを三つください。", "ko↑reo mi↑Qtsu ku↑dasa↓i."),
    ("五千円でお願いします。", "go↑seNeNde o↑negaiʃima↓sU."),
    ("私の趣味は読書です。", "wa↑taʃino ʃu↓miwa do↓kUʃodesU."),
    ("毎朝七時に起きます。", "ma↓iasa ʃI↑ʧijini o↑kima↓sU."),
    ("三月二十日に日本へ行きます。",
     "sa↑Ngatsu ha↑tsUkani ni↑ho↓Ne i↑kima↓sU."),
    ("今は十時十五分です。", "i↓mawa ju↑uji ju↑ugofuNde↓sU."),
    ("一本のペンと三冊の本。", "i↑QpoNno pe↓Nto sa↑Nsatsuno ho↓N."),
    ("山の上から海が見えます。",
     "ya↑ma↓no u↑ekara u↓miga mi↑ema↓sU."),
    ("写真を撮ってもいいですか。", "ʃa↑ʃiNo to↓QtemoiidesUka."),
    ("明日は雨が降るでしょう。", "a↑ʃIta↓wa a↓mega fu↓rudeʃou."),
    ("天気がいいから散歩しましょう。",
     "te↓Nkigaiikara sa↑Npoʃimaʃo↓u."),
    ("彼は医者になりました。", "ka↓rewa i↑ʃaninarima↓ʃIta."),
    ("漢字を書くのは難しいです。",
     "ka↑Njio ka↓kunowa mu↑zukaʃi↓idesU."),
    ("時間がありません。", "ji↑kaNgaarimase↓N."),
]


@pytest.mark.parametrize("text,expected", GOLDENS, ids=range(len(GOLDENS)))
def test_accent_goldens(text, expected):
    assert japanese_to_romaji_with_accent(text) == expected


def test_accent_marks_survive_to_ipa2():
    out = japanese_to_ipa2("昨日映画を見ました。")
    assert "↓" in out and "↑" in out
    # devoiced vowels map to the starred IPA forms
    assert "i*" in out or "ɯ*" in out


def test_fall_only_before_following_mora():
    # odaka word with no particle: nucleus is phrase-final → no ↓ emitted
    # (reference rule needs a following mora in the same phrase)
    out = japanese_to_romaji_with_accent("山と川")
    assert out == "ya↑ma↓to ka↑wa"


def test_accent_1_startswith_fall_no_rise():
    # accent-type-1 words fall after mora 1 and never take ↑
    out = japanese_to_romaji_with_accent("駅はどこですか")
    assert out.startswith("e↓ki")


def test_no_kanji_dropped():
    # every kanji contributes phonemes (on'yomi fallback), incl. rare runs
    out = japanese_to_romaji_with_accent("経済産業省の環境技術")
    stripped = re.sub(r"[ ↑↓.]", "", out)
    assert len(stripped) > 15


def test_unknown_kanji_logged_not_silent(caplog):
    import logging

    with caplog.at_level(logging.WARNING):
        japanese_to_romaji_with_accent("鬱蒼とした森")
    # 鬱/蒼 are beyond the embedded table → warn, never silently drop text
    assert any("no reading" in r.message for r in caplog.records)


def test_number_reading():
    assert number_to_kana("0") == "ゼロ"
    assert number_to_kana("15") == "じゅうご"
    assert number_to_kana("300") == "さんびゃく"
    assert number_to_kana("600") == "ろっぴゃく"
    assert number_to_kana("800") == "はっぴゃく"
    assert number_to_kana("3000") == "さんぜん"
    assert number_to_kana("8000") == "はっせん"
    assert number_to_kana("2024") == "にせんにじゅうよん"
    assert number_to_kana("10000") == "いちまん"
    assert number_to_kana("123456") == "じゅうにまんさんぜんよんひゃくごじゅうろく"


def test_counter_euphony():
    assert _number_with_counter(1, "回") == "いっかい"
    assert _number_with_counter(1, "本") == "いっぽん"
    assert _number_with_counter(3, "本") == "さんぼん"
    assert _number_with_counter(6, "回") == "ろっかい"
    assert _number_with_counter(6, "冊") == "ろくさつ"
    assert _number_with_counter(8, "冊") == "はっさつ"
    assert _number_with_counter(10, "分") == "じゅっぷん"
    assert _number_with_counter(15, "分") == "じゅうごふん"
    assert _number_with_counter(1, "人") == "ひとり"
    assert _number_with_counter(2, "人") == "ふたり"
    assert _number_with_counter(4, "時") == "よじ"
    assert _number_with_counter(9, "時") == "くじ"
    assert _number_with_counter(20, "日") == "はつか"
    assert _number_with_counter(100, "回") == "ひゃっかい"


def test_ja_output_fully_tokenizable():
    """No UNK ids for accent-marked, devoiced JA output (the ↑↓* symbols
    are part of the shipped bpe_69 vocab)."""
    from vallex_tpu.frontend.tokenizer import PhonemeTokenizer

    tok = PhonemeTokenizer()
    for text, _ in GOLDENS[:12]:
        ids, langs = tok.tokenize(f"_[JA]{text}[JA]")
        assert len(ids) == len(langs)
        assert 0 not in ids, text


def test_round3_second_tier_entries():
    """Spot-goldens for the round-3 second lexicon tier (verbs/adjectives
    in dictionary form, kun-reading compounds, accented Sino-compounds) —
    words where the onyomi+heiban fallback produced a wrong reading or
    accent before the tier landed. Accents per NHK/OJAD convention."""
    from vallex_tpu.frontend.japanese_data import WORDS

    expected = {
        "教える": ("おしえる", 0),   # fallback read きょうえる
        "閉める": ("しめる", 2),
        "手伝う": ("てつだう", 3),  # rendaku: てつだう not てつたう
        "食べ物": ("たべもの", 3),
        "読み方": ("よみかた", 3),
        "出口": ("でぐち", 1),      # rendaku + accent 1
        "入口": ("いりぐち", 0),    # kun reading, not にゅうこう
        "企業": ("きぎょう", 1),
        "制度": ("せいど", 1),
        "解釈": ("かいしゃく", 1),
        "物語": ("ものがたり", 3),
        "果物": ("くだもの", 2),    # irregular kun, not かぶつ
        "眼鏡": ("めがね", 1),
        "珍しい": ("めずらしい", 4),
        "柔らかい": ("やわらかい", 4),
    }
    for surface, (reading, accent) in expected.items():
        assert WORDS.get(surface) == (reading, accent), (
            surface, WORDS.get(surface)
        )
