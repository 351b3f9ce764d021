"""Byte-identity of text extraction vs the reference 3-regex pipeline
(reference spiders/labels/web.py:47-50), applied independently here."""

import re

from blockchainspider_ray.functions.text import (
    extract_text,
    extract_text_batch,
    find_eth_addresses,
    find_eth_tx_hashes,
)


def reference_extract(text: str) -> str:
    # The exact reference pipeline, re-stated as the oracle.
    content = re.sub(r"<style[\s\S]*?</style>", " ", text)
    content = re.sub(r"<script[\s\S]*?</script>", " ", content)
    content = re.sub("<(.*?)>", " ", content)
    return content


CASES = [
    "<html><body>hello</body></html>",
    "<style>a{b}</style>text<script>var x=1;</script>tail",
    "<style>multi\nline\n</style>mid<script\n type='x'>\ny\n</script>z",
    "no tags at all",
    "<a href='x'>anchor</a> <b>bold</b>",
    "unclosed <style>never ends...",
    "nested <div><span>deep</span></div>",
    "unicode 区块链 <p>蜘蛛</p> done",
    "< lone bracket > and <>",
    "attr gt <div data-x='a>b'>body</div>",
]


def test_byte_identical_extraction():
    for html in CASES:
        assert extract_text(html) == reference_extract(html)


def test_batch_matches_scalar_and_handles_bytes():
    outs = extract_text_batch([c.encode("utf-8") for c in CASES])
    assert outs == [reference_extract(c) for c in CASES]
    assert extract_text_batch([None]) == [""]


def test_fixture_text_column_is_golden(pages_table):
    from blockchainspider_ray.functions.links import decode_html

    htmls = pages_table.column("html").to_pylist()
    texts = pages_table.column("text").to_pylist()
    for h, t in zip(htmls, texts):
        assert reference_extract(decode_html(h)) == t


def test_entity_regexes():
    t = " addr 0x" + "ab" * 20 + " tx 0x" + "cd" * 32 + " end"
    # like the reference regex, the address pattern also prefix-matches the
    # first 40 hex chars of a 64-hex tx hash
    assert find_eth_addresses(t) == ["0x" + "ab" * 20, "0x" + "cd" * 20]
    assert find_eth_tx_hashes(t) == ["0x" + "cd" * 32]
    # no leading \W -> no match (reference pattern requires it)
    assert find_eth_addresses("0x" + "ab" * 20) == []


def test_arrow_kernels_match_python_regexes():
    """RE2 kernel parity with the Python reference regexes: byte-identical
    text strip; identical entity and token counts (incl. unicode)."""
    import re

    import pyarrow as pa
    import pyarrow.compute as pc

    from blockchainspider_ray.functions.text import (
        RE_ETH_ADDRESS,
        RE_ETH_TX_HASH,
        extract_text,
        extract_text_arrow,
    )

    docs = [
        "<html><style>a{}</style><script>x<y</script><p>hi 0xAbCdEf0123456789"
        + "a" * 34 + " 中文 <b>bold</b></p></html>",
        "no tags at all 0x" + "f" * 64 + " tail",
        "<a href='x'>ä</a><style>s</style>",
        "",
    ]
    arr = pa.array(docs, pa.string())
    assert extract_text_arrow(arr).to_pylist() == [extract_text(d) for d in docs]
    texts = [extract_text(d) for d in docs]
    tarr = pa.array(texts, pa.string())
    got_addr = pc.count_substring_regex(tarr, pattern=r"(?i)\W0x[0-9a-f]{40}").to_pylist()
    assert got_addr == [len(RE_ETH_ADDRESS.findall(t)) for t in texts]
    got_tx = pc.count_substring_regex(tarr, pattern=r"(?i)\W0x[0-9a-f]{64}").to_pylist()
    assert got_tx == [len(RE_ETH_TX_HASH.findall(t)) for t in texts]
    got_tok = pc.count_substring_regex(tarr, pattern=r"\S+").to_pylist()
    assert got_tok == [len(re.findall(r"\S+", t)) for t in texts]
