"""Text item tests, ported from /root/reference/ocrs/src/text_items.rs:131-186."""

from ocrs_ray.geometry import Rect
from ocrs_ray.text_items import TextChar, TextLine, TextWord


def gen_text_chars(text: str, width: int) -> list[TextChar]:
    return [
        TextChar(char=ch, rect=Rect.from_tlhw(0, i * width, 25, width))
        for i, ch in enumerate(text)
    ]


def test_item_display():
    line = TextLine(gen_text_chars("foo bar baz", 10))
    assert str(line) == "foo bar baz"


def test_item_rotated_rect():
    char_width = 10
    word = TextWord(gen_text_chars("foo", char_width))
    assert word.bounding_rect() == Rect.from_tlhw(0, 0, 25, char_width * 3)

    rr = word.rotated_rect()
    br = rr.bounding_rect()
    assert (br.top, br.left, br.bottom, br.right) == (0.0, 0.0, 25.0, 30.0)
    assert rr.up_axis() == (0.0, -1.0)
    corners = [(round(c.y), round(c.x)) for c in rr.corners()]
    assert corners == [(25, 30), (25, 0), (0, 0), (0, 30)]


def test_line_words():
    char_width = 10
    line = TextLine(gen_text_chars("foo bar  baz ", char_width))
    words = line.words()
    assert len(words) == 3
    assert str(words[0]) == "foo"
    assert words[0].bounding_rect() == Rect.from_tlhw(0, 0, 25, char_width * 3)
    assert str(words[1]) == "bar"
    assert words[1].bounding_rect() == Rect.from_tlhw(0, char_width * 4, 25, char_width * 3)
    assert str(words[2]) == "baz"
    assert words[2].bounding_rect() == Rect.from_tlhw(0, char_width * 9, 25, char_width * 3)
