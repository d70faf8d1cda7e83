"""Unit tests for the detection core (reference analogue:
dlp.inspectContent stubs, test/testing/stubs/dlp/*)."""

from auto_data_tokenize_spark.functions import detectors as d


def spans(text):
    return [(s.info_type, s.text) for s in d.find_spans(text)]


def test_email_basic():
    assert spans("mail me at alice99@example.com pls") == [
        ("EMAIL_ADDRESS", "alice99@example.com")
    ]


def test_email_subdomain_and_plus():
    assert spans("x a+b.c_d%e@sub.mail-example.co.uk y") == [
        ("EMAIL_ADDRESS", "a+b.c_d%e@sub.mail-example.co.uk")
    ]


def test_phone_formats():
    for p in ["(415) 555-0143", "415-555-0143", "+1 415.555.0143", "415 555 0143",
              "1-415-555-0143"]:
        assert spans(f"call {p} now") == [("PHONE_NUMBER", p)], p


def test_phone_requires_separator():
    # bare 10-digit runs are not phones (they'd be CC candidates, but 10<13)
    assert spans("id 4155550143 ok") == []


def test_credit_card_luhn():
    assert spans("card 4111111111111111 ok") == [
        ("CREDIT_CARD_NUMBER", "4111111111111111")
    ]
    # same digits +1 → Luhn fails → no detection
    assert spans("card 4111111111111112 ok") == []


def test_credit_card_separators():
    assert spans("pay 4111-1111-1111-1111 now") == [
        ("CREDIT_CARD_NUMBER", "4111-1111-1111-1111")
    ]
    assert spans("pay 4111 1111 1111 1111 now") == [
        ("CREDIT_CARD_NUMBER", "4111 1111 1111 1111")
    ]


def test_amex_15_digit():
    assert spans("amex 378282246310005 .") == [
        ("CREDIT_CARD_NUMBER", "378282246310005")
    ]


def test_ssn_valid_and_structure_rules():
    assert spans("ssn 536-90-4399 ok") == [
        ("US_SOCIAL_SECURITY_NUMBER", "536-90-4399")
    ]
    for bad in ["000-12-3456", "666-12-3456", "900-12-3456", "123-00-4567",
                "123-45-0000"]:
        assert spans(f"ssn {bad} ok") == [], bad


def test_no_pii():
    assert spans("just a plain sentence with number 42") == []
    assert spans("") == []
    assert spans(None) == []


def test_multiple_spans_ordered():
    t = "email bob@example.org or call 212-555-0100"
    assert spans(t) == [
        ("EMAIL_ADDRESS", "bob@example.org"),
        ("PHONE_NUMBER", "212-555-0100"),
    ]


def test_leftmost_single_pass():
    # email containing digits wins over any inner candidate
    t = "a4111111111111111@example.com"
    assert spans(t) == [("EMAIL_ADDRESS", "a4111111111111111@example.com")]


def test_replace_spans_failed_validation_kept():
    t = "card 4111111111111112 and bob@x.io"
    out = d.replace_spans(t, lambda it, m: f"<{it}>")
    assert out == "card 4111111111111112 and <EMAIL_ADDRESS>"


def test_decimal_not_cc():
    assert spans("value 1234567890123.456 here") == []
