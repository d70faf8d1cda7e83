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


# --- extended set: PERSON_NAME + DATE_OF_BIRTH ---------------------------


def xspans(text):
    return [
        (s.info_type, s.text)
        for s in d.find_spans(text, d.EXTENDED_INFO_TYPES)
    ]


def test_extended_not_in_default_set():
    t = "Alice Smith born 1987-04-12"
    assert spans(t) == []  # default four: untouched
    assert xspans(t) == [
        ("PERSON_NAME", "Alice Smith"),
        ("DATE_OF_BIRTH", "1987-04-12"),
    ]


def test_person_name_gazetteer():
    assert xspans("ask Grace about it") == [("PERSON_NAME", "Grace")]
    assert xspans("Judy Garcia joined") == [("PERSON_NAME", "Judy Garcia")]
    # case-sensitive dictionary: lowercase homographs never match
    assert xspans("the grace period ends") == []
    # unknown capitalized words are not names (dictionary, not NER)
    assert xspans("Customer reported an issue") == []


def test_person_name_unknown_surname_keeps_first():
    # known first + unknown next word: span covers the first name only
    assert xspans("Bob Xylophone called") == [("PERSON_NAME", "Bob")]


def test_dob_requires_birth_context():
    assert xspans("born on 4/12/1987 in Ohio") == [
        ("DATE_OF_BIRTH", "4/12/1987")
    ]
    assert xspans("DOB: 1987-04-12") == [("DATE_OF_BIRTH", "1987-04-12")]
    assert xspans("date of birth 1987-04-12") == [
        ("DATE_OF_BIRTH", "1987-04-12")
    ]
    # a bare date with no context is NOT a DOB
    assert xspans("meeting on 1987-04-12") == []


def test_dob_month_name_format():
    assert xspans("born on April 12, 1987 in Ohio") == [
        ("DATE_OF_BIRTH", "April 12, 1987")
    ]
    assert xspans("DOB: May 1, 1955") == [("DATE_OF_BIRTH", "May 1, 1955")]
    assert xspans("on April 12, 1987 no context") == []
    assert xspans("born on February 30, 1987 x") == []  # no Feb 30
    assert xspans("born on April 1, 1830 x") == []  # implausible year


def test_dob_plausibility_demotes():
    assert xspans("born on 1987-02-30 x") == []  # no Feb 30
    assert xspans("born on 13/1/1987 x") == []  # month 13
    assert xspans("born on 1/1/1880 x") == []  # implausible year
    assert xspans("born on 1/1/2044 x") == []  # future year


def test_dob_span_covers_date_only():
    sp = d.find_spans("DOB: 1987-04-12", d.EXTENDED_INFO_TYPES)
    assert len(sp) == 1 and sp[0].text == "1987-04-12"
    assert sp[0].start == len("DOB: ")


def test_replace_extended_keeps_dob_context():
    out = d.replace_spans(
        "Alice Smith, born on 1987-04-12, email a@b.co",
        lambda it, m: f"<{it}>",
        d.EXTENDED_INFO_TYPES,
    )
    assert out == "<PERSON_NAME>, born on <DATE_OF_BIRTH>, email <EMAIL_ADDRESS>"


def test_replace_extended_failed_dob_kept():
    out = d.replace_spans(
        "born on 2/30/1990 maybe", lambda it, m: f"<{it}>", d.EXTENDED_INFO_TYPES
    )
    assert out == "born on 2/30/1990 maybe"


def test_default_precedence_unchanged_by_extension():
    # an email containing a dictionary name still resolves as EMAIL
    t = "Alice@example.com"
    assert xspans(t) == [("EMAIL_ADDRESS", "Alice@example.com")]


def test_unknown_info_type_rejected():
    import pytest

    with pytest.raises(ValueError):
        d.find_spans("x", ("NOT_A_TYPE",))


def test_subset_selection():
    t = "Alice Smith born 1987-04-12, a@b.co"
    only_names = d.find_spans(t, (d.PERSON_NAME,))
    assert [(s.info_type, s.text) for s in only_names] == [
        ("PERSON_NAME", "Alice Smith")
    ]
