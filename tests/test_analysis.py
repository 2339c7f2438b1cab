"""Golden analyzer/comparator tests, ported 1:1 from the reference's active
test suite (test/units/whitespace_analyzer_test.rb,
simple_identifier_analyzer_test.rb, comparator_test.rb)."""

import pytest

from fatespark.analysis import (
    ascii_fold,
    analyze,
    doc_length,
    extract_text,
    identifier_token_offsets,
    whitespace_token_offsets,
    whitespace_tokens,
)


class TestWhitespaceAnalyzer:
    # test/units/whitespace_analyzer_test.rb:9-35
    def test_blank(self):
        assert whitespace_token_offsets("", 0, 0, 0) == []

    def test_single_token(self):
        assert whitespace_token_offsets("test", 0, 0, 0) == [[0, 0, 0]]

    def test_spaces(self):
        assert whitespace_token_offsets("test1 test2  test3", 0, 0, 0) == [
            [0, 0, 0], [6, 0, 0], [13, 0, 0]]

    def test_tabs(self):
        assert whitespace_token_offsets("test1\ttest2\t test3", 0, 0, 0) == [
            [0, 0, 0], [6, 0, 0], [13, 0, 0]]

    def test_newlines(self):
        assert whitespace_token_offsets("test1\ntest2\n test3", 0, 0, 0) == [
            [0, 0, 0], [6, 0, 0], [13, 0, 0]]

    def test_carriage_returns(self):
        assert whitespace_token_offsets("test1\rtest2\r\ntest3", 0, 0, 0) == [
            [0, 0, 0], [6, 0, 0], [13, 0, 0]]

    def test_offset_shift(self):
        assert whitespace_token_offsets("test", 10, 0, 0) == [[10, 0, 0]]

    def test_leading_whitespace_skipped(self):
        assert whitespace_token_offsets("  test", 0, 0, 0) == [[2, 0, 0]]

    def test_base_offset_and_index_passthrough(self):
        assert whitespace_token_offsets("a b", 5, 99, 3) == [[5, 99, 3], [7, 99, 3]]


class TestSimpleIdentifierAnalyzer:
    # test/units/simple_identifier_analyzer_test.rb:9-33
    @pytest.mark.parametrize("text", ["test", "Test", "Test39", "Test_39", "_test"])
    def test_single_identifier(self, text):
        assert identifier_token_offsets(text, 0, 0, 0) == [[0, 0, 0]]

    def test_blank(self):
        assert identifier_token_offsets("", 0, 0, 0) == []

    def test_breaking_chars(self):
        assert identifier_token_offsets("test1 test2", 0, 0, 0) == [[0, 0, 0], [6, 0, 0]]
        assert identifier_token_offsets("test1?test2", 0, 0, 0) == [[0, 0, 0], [6, 0, 0]]

    @pytest.mark.parametrize("text", ["1", "$@!"])
    def test_invalid_identifiers(self, text):
        assert identifier_token_offsets(text, 0, 0, 0) == []

    def test_offset_shift(self):
        assert identifier_token_offsets("test", 10, 0, 0) == [[10, 0, 0]]

    def test_leading_digits_skipped(self):
        assert identifier_token_offsets("1cd ab", 0, 0, 0) == [[1, 0, 0], [4, 0, 0]]


class TestComparator:
    # test/units/comparator_test.rb:9-16 — ASCII-only fold
    def test_ascii_downcase(self):
        assert ascii_fold("Muppet") == "muppet"

    def test_cyrillic_passthrough(self):
        s = "Любовная история"
        assert ascii_fold(s) == s

    def test_mixed(self):
        assert ascii_fold("FatEntry_42 Любовь XYZ") == "fatentry_42 Любовь xyz"


class TestAnalyze:
    def test_analyze_folds(self):
        assert analyze("Smith SMITH smith") == ["smith", "smith", "smith"]

    def test_doc_length(self):
        assert doc_length("a b\tc\nd") == 4
        assert doc_length("") == 0

    def test_unicode_nbsp_not_whitespace(self):
        # ASCII whitespace only: U+00A0 must NOT split tokens (parity with
        # Ruby 1.8 byte-wise \s and RE2 [ \t\n\r\f\v])
        assert whitespace_tokens("a b") == ["a b"]


class TestExtractText:
    def test_roundtrip_byte_identical(self):
        text = "Smith fat_entry Любовь\t42\nthe end"
        html = b"<html><body>" + text.encode("utf-8") + b"</body></html>"
        assert extract_text(html) == text

    def test_unwrapped_passthrough(self):
        assert extract_text("plain".encode()) == "plain"
