"""3-level metadata API tests — the analog of the reference's
test_libFLAC metadata_manip.c coverage (level 0 getters, level 1
SimpleIterator file edits, level 2 Chain read-modify-write with padding
reuse vs. rewrite), verified against full decodes and the reference
`metaflac`/`flac` binaries where available."""

import os
import subprocess

import numpy as np
import pytest

from tests.conftest import make_signal, oracle_path

from flac_tpu.decode.host_decoder import decode_bytes
from flac_tpu.encode.encoder import encode_file
from flac_tpu.metadata import (
    Application,
    MetadataChain,
    MetadataIOError,
    Padding,
    Picture,
    SimpleIterator,
    StreamInfo,
    VorbisComment,
    get_picture,
    get_streaminfo,
    get_tags,
)


SIG = make_signal(4096 * 2 + 300, 2, 16, kind="quiet", seed=21)


def _make_file(tmp_path, metadata=None, name="m.flac"):
    path = tmp_path / name
    encode_file(SIG, 44100, 16, str(path), level=2, batch_frames=8,
                metadata=metadata)
    return str(path)


def _assert_audio_intact(path):
    pcm, si, _ = decode_bytes(open(path, "rb").read())
    np.testing.assert_array_equal(pcm, SIG)
    oracle = oracle_path()
    if oracle is not None:
        r = subprocess.run([str(oracle), "-t", path], capture_output=True, text=True)
        assert r.returncode == 0, r.stderr[-300:]


class TestLevel0:
    def test_getters(self, tmp_path):
        pic = Picture(picture_type=3, mime_type="image/png", description="cover",
                      width=2, height=2, depth=24, data=b"\x89PNGfake")
        vc = VorbisComment(vendor_string="x", comments=["TITLE=Song", "ARTIST=Me"])
        path = _make_file(tmp_path, metadata=[vc, pic])
        si = get_streaminfo(path)
        assert isinstance(si, StreamInfo) and si.sample_rate == 44100
        tags = get_tags(path)
        assert tags.find_entry("TITLE") == "Song"
        got = get_picture(path, picture_type=3)
        assert got is not None and got.data == b"\x89PNGfake"
        assert get_picture(path, picture_type=4) is None
        assert get_picture(path, max_width=1) is None


class TestChain:
    def test_inplace_edit_with_padding(self, tmp_path):
        vc = VorbisComment(vendor_string="x", comments=["TITLE=Old"])
        path = _make_file(tmp_path, metadata=[vc, Padding(length=512)])
        size0 = os.path.getsize(path)
        chain = MetadataChain.read(path)
        assert not chain.check_if_tempfile_needed()
        tags = chain.get(VorbisComment)
        tags.set_entry("TITLE", "A much longer title than before")
        tags.set_entry("ALBUM", "New Album")
        chain.write(use_padding=True)
        assert os.path.getsize(path) == size0  # absorbed by padding
        assert get_tags(path).find_entry("ALBUM") == "New Album"
        _assert_audio_intact(path)

    def test_rewrite_when_padding_exhausted(self, tmp_path):
        path = _make_file(tmp_path, metadata=[VorbisComment(vendor_string="x")])
        size0 = os.path.getsize(path)
        chain = MetadataChain.read(path)
        chain.get(VorbisComment).set_entry("COMMENT", "y" * 4000)
        assert chain.check_if_tempfile_needed(use_padding=True)
        chain.write(use_padding=True)
        assert os.path.getsize(path) > size0
        assert get_tags(path).find_entry("COMMENT") == "y" * 4000
        _assert_audio_intact(path)

    def test_shrink_without_padding_rewrites(self, tmp_path):
        big = VorbisComment(vendor_string="x", comments=["C=" + "z" * 1000])
        path = _make_file(tmp_path, metadata=[big])
        size0 = os.path.getsize(path)
        chain = MetadataChain.read(path)
        chain.get(VorbisComment).remove_entries("C")
        chain.write(use_padding=False)
        assert os.path.getsize(path) < size0
        _assert_audio_intact(path)

    def test_merge_and_sort_padding(self, tmp_path):
        path = _make_file(tmp_path, metadata=[Padding(length=10),
                                              Padding(length=20),
                                              Application(app_id=b"test", data=b"d"),
                                              Padding(length=30)])
        chain = MetadataChain.read(path)
        chain.merge_padding()
        pads = [b for b in chain.blocks if isinstance(b, Padding)]
        assert [p.length for p in pads] == [10 + 4 + 20, 30]
        chain.sort_padding()
        pads = [b for b in chain.blocks if isinstance(b, Padding)]
        assert len(pads) == 1 and chain.blocks[-1] is pads[0]
        assert pads[0].length == (14 + 4 + 20) + (4 + 30) - 4
        chain.write()
        _assert_audio_intact(path)

    def test_streaminfo_must_stay_first(self, tmp_path):
        path = _make_file(tmp_path)
        chain = MetadataChain.read(path)
        chain.blocks = chain.blocks[1:] or [Padding(length=1)]
        with pytest.raises(MetadataIOError):
            chain.write()


class TestSimpleIterator:
    def test_walk_and_edit(self, tmp_path):
        vc = VorbisComment(vendor_string="x", comments=["TITLE=t"])
        path = _make_file(tmp_path, metadata=[vc, Padding(length=256)])
        it = SimpleIterator(path)
        assert isinstance(it.get_block(), StreamInfo)
        types = [it.get_block_type()]
        while it.next():
            types.append(it.get_block_type())
        assert 4 in types and 1 in types  # vorbis + padding present
        # move to the vorbis block and replace it
        it2 = SimpleIterator(path)
        while not isinstance(it2.get_block(), VorbisComment):
            assert it2.next()
        newvc = VorbisComment(vendor_string="x", comments=["TITLE=replaced"])
        it2.set_block(newvc, use_padding=True)
        assert get_tags(path).find_entry("TITLE") == "replaced"
        _assert_audio_intact(path)

    def test_insert_and_delete(self, tmp_path):
        path = _make_file(tmp_path, metadata=[Padding(length=128)])
        it = SimpleIterator(path)
        it.insert_block_after(Application(app_id=b"abcd", data=b"payload"))
        assert it.get_block_type() == 2  # now on the inserted APPLICATION
        _assert_audio_intact(path)
        it3 = SimpleIterator(path)
        while it3.get_block_type() != 2:
            assert it3.next()
        it3.delete_block(use_padding=True)
        chain = MetadataChain.read(path)
        assert chain.get(Application) is None
        _assert_audio_intact(path)

    def test_offsets_match_file(self, tmp_path):
        path = _make_file(tmp_path, metadata=[Padding(length=64)])
        it = SimpleIterator(path)
        data = open(path, "rb").read()
        while True:
            off = it.get_block_offset()
            assert (data[off] & 0x7F) == it.get_block_type()
            assert int.from_bytes(data[off + 1 : off + 4], "big") == it.get_block_length()
            if not it.next():
                break


class TestOracleInterop:
    def test_metaflac_reads_our_edits(self, tmp_path):
        oracle = oracle_path()
        if oracle is None:
            pytest.skip("reference oracle unavailable")
        metaflac = oracle.parent / "metaflac"
        if not metaflac.exists():
            pytest.skip("metaflac oracle unavailable")
        path = _make_file(tmp_path, metadata=[VorbisComment(vendor_string="x"),
                                              Padding(length=256)])
        chain = MetadataChain.read(path)
        chain.get(VorbisComment).set_entry("ARTIST", "Unit Test")
        chain.write()
        r = subprocess.run([str(metaflac), "--show-tag=ARTIST", path],
                           capture_output=True, text=True)
        assert r.returncode == 0 and "ARTIST=Unit Test" in r.stdout

    def test_we_read_metaflac_edits(self, tmp_path):
        oracle = oracle_path()
        if oracle is None:
            pytest.skip("reference oracle unavailable")
        metaflac = oracle.parent / "metaflac"
        if not metaflac.exists():
            pytest.skip("metaflac oracle unavailable")
        path = _make_file(tmp_path, metadata=[Padding(length=256)])
        r = subprocess.run([str(metaflac), "--set-tag=GENRE=Test", path],
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stderr[-300:]
        assert get_tags(path).find_entry("GENRE") == "Test"
        _assert_audio_intact(path)


class TestSimpleIteratorInPlace:
    """The level-1 iterator must edit the smallest possible byte range:
    equal-size set_block and padding-absorbed edits leave every other byte
    of the file untouched (no whole-file rewrite), matching the reference's
    in-place block walking (metadata_iterators.c:673+)."""

    def _inode_and_bytes(self, path):
        return os.stat(path).st_ino, open(path, "rb").read()

    def test_set_block_equal_len_in_place(self, tmp_path):
        vc = VorbisComment(vendor_string="x", comments=["TITLE=aaaa"])
        path = _make_file(tmp_path, metadata=[vc])
        ino0, before = self._inode_and_bytes(path)
        it = SimpleIterator(path)
        while not isinstance(it.get_block(), VorbisComment):
            assert it.next()
        off = it.get_block_offset()
        span = 4 + it.get_block_length()
        it.set_block(VorbisComment(vendor_string="x", comments=["TITLE=bbbb"]))
        ino1, after = self._inode_and_bytes(path)
        assert ino1 == ino0  # same inode: no tempfile rewrite happened
        assert len(after) == len(before)
        assert after[:off] == before[:off]
        assert after[off + span:] == before[off + span:]
        assert get_tags(path).find_entry("TITLE") == "bbbb"
        _assert_audio_intact(path)

    def test_set_block_shrink_emits_padding(self, tmp_path):
        vc = VorbisComment(vendor_string="x", comments=["TITLE=" + "y" * 64])
        path = _make_file(tmp_path, metadata=[vc])
        ino0, before = self._inode_and_bytes(path)
        it = SimpleIterator(path)
        while not isinstance(it.get_block(), VorbisComment):
            assert it.next()
        it.set_block(VorbisComment(vendor_string="x", comments=["TITLE=z"]))
        ino1, after = self._inode_and_bytes(path)
        assert ino1 == ino0 and len(after) == len(before)
        types = [b.type_code for b in MetadataChain.read(path).blocks]
        assert 1 in types  # the freed bytes became a PADDING block
        assert get_tags(path).find_entry("TITLE") == "z"
        _assert_audio_intact(path)

    def test_set_block_grow_absorbs_next_padding(self, tmp_path):
        vc = VorbisComment(vendor_string="x", comments=["TITLE=a"])
        path = _make_file(tmp_path, metadata=[vc, Padding(length=256)])
        ino0, before = self._inode_and_bytes(path)
        it = SimpleIterator(path)
        while not isinstance(it.get_block(), VorbisComment):
            assert it.next()
        it.set_block(VorbisComment(vendor_string="x",
                                   comments=["TITLE=" + "w" * 100]))
        ino1, after = self._inode_and_bytes(path)
        assert ino1 == ino0 and len(after) == len(before)
        assert get_tags(path).find_entry("TITLE") == "w" * 100
        _assert_audio_intact(path)

    def test_insert_consumes_padding_in_place(self, tmp_path):
        path = _make_file(tmp_path, metadata=[Padding(length=256)])
        ino0, before = self._inode_and_bytes(path)
        it = SimpleIterator(path)
        # position on the block right before the PADDING block
        while it._read_header(it.get_block_offset() + 4
                              + it.get_block_length())[1] != 1:
            assert it.next()
        it.insert_block_after(Application(app_id=b"abcd", data=b"pp"))
        assert it.get_block_type() == 2
        ino1, after = self._inode_and_bytes(path)
        assert ino1 == ino0 and len(after) == len(before)
        _assert_audio_intact(path)

    def test_delete_with_padding_zeroes_in_place(self, tmp_path):
        vc = VorbisComment(vendor_string="x", comments=["TITLE=gone"])
        path = _make_file(tmp_path, metadata=[vc])
        ino0, before = self._inode_and_bytes(path)
        it = SimpleIterator(path)
        while not isinstance(it.get_block(), VorbisComment):
            assert it.next()
        off, span = it.get_block_offset(), 4 + it.get_block_length()
        it.delete_block(use_padding=True)
        ino1, after = self._inode_and_bytes(path)
        assert ino1 == ino0 and len(after) == len(before)
        assert after[off] & 0x7F == 1  # PADDING header
        assert all(b == 0 for b in after[off + 4: off + span])  # zeroed body
        assert get_tags(path) is None
        _assert_audio_intact(path)

    def test_delete_last_without_padding_promotes_is_last(self, tmp_path):
        vc = VorbisComment(vendor_string="x", comments=["TITLE=tail"])
        path = _make_file(tmp_path, metadata=[vc])
        before = open(path, "rb").read()
        it = SimpleIterator(path)
        while not it.is_last():
            assert it.next()
        assert isinstance(it.get_block(), VorbisComment)
        it.delete_block(use_padding=False)
        after = open(path, "rb").read()
        assert len(after) < len(before)  # file actually shrank
        assert it.is_last()  # iterator sits on the new last block
        chain = MetadataChain.read(path)  # re-parses: is_last flags are valid
        assert chain.get(VorbisComment) is None
        _assert_audio_intact(path)

    def test_set_block_grow_without_padding_rewrites(self, tmp_path):
        vc = VorbisComment(vendor_string="x", comments=["TITLE=a"])
        path = _make_file(tmp_path, metadata=[vc])
        it = SimpleIterator(path)
        while not isinstance(it.get_block(), VorbisComment):
            assert it.next()
        big = VorbisComment(vendor_string="x", comments=["TITLE=" + "q" * 5000])
        it.set_block(big, use_padding=True)
        assert get_tags(path).find_entry("TITLE") == "q" * 5000
        # iterator state stays coherent after the rewrite
        assert it.get_block_length() == len(big.body_bytes())
        _assert_audio_intact(path)


class TestOggChain:
    """FLAC__metadata_chain_read_ogg parity (metadata.h:849): the chain
    reads from Ogg FLAC; --list on an .oga matches the native dump; and
    (beyond-reference) write() re-paginates instead of failing."""

    def _pair(self, tmp_path):
        from pathlib import Path

        from flac_tpu.ogg import ogg_from_flac_stream

        p = Path(_make_file(tmp_path))
        oga = tmp_path / "m.oga"
        oga.write_bytes(ogg_from_flac_stream(p.read_bytes(), serial=0x7357))
        return p, oga

    def test_read_ogg_matches_native_blocks(self, tmp_path):
        p, oga = self._pair(tmp_path)
        native = MetadataChain.read(str(p))
        via_ogg = MetadataChain.read(str(oga))   # auto-detects OggS
        assert via_ogg._is_ogg
        from flac_tpu.metadata import serialize_metadata
        assert serialize_metadata(via_ogg.blocks) == \
            serialize_metadata(native.blocks)

    def test_metaflac_list_on_oga_matches(self, tmp_path):
        import io
        import sys

        from flac_tpu.cli import metaflac as mf

        p, oga = self._pair(tmp_path)

        def listing(path):
            buf = io.StringIO()
            old = sys.stdout
            sys.stdout = buf
            try:
                assert mf.main(["--list", path]) == 0
            finally:
                sys.stdout = old
            return buf.getvalue().replace(path, "<file>")

        assert listing(str(p)) == listing(str(oga))

    def test_ogg_chain_edit_rewrite(self, tmp_path):
        from flac_tpu.ogg import decode_ogg_flac

        p, oga = self._pair(tmp_path)
        sig = decode_bytes(p.read_bytes())[0]
        chain = MetadataChain.read_ogg(str(oga))
        vc = chain.get(VorbisComment)
        if vc is None:
            vc = VorbisComment(vendor_string="t")
            chain.blocks.insert(1, vc)
        vc.comments.append("TITLE=ogg chain")
        chain.write()
        again = MetadataChain.read_ogg(str(oga))
        assert any(c == "TITLE=ogg chain"
                   for c in again.get(VorbisComment).comments)
        pcm, _si, _info = decode_ogg_flac(oga.read_bytes())
        np.testing.assert_array_equal(pcm, sig)


class TestChainCallbacks:
    """The *_with_callbacks chain variants (metadata.h:869,896,958,982)
    as Python file-like-handle methods."""

    def test_read_io_write_io_in_place(self, tmp_path):
        import io as _io

        p = _make_file(tmp_path, metadata=[Padding(length=256)])
        buf = bytearray(open(p, "rb").read())
        handle = _io.BytesIO(bytes(buf))
        chain = MetadataChain.read_io(handle)
        vc = chain.get(VorbisComment)
        vc.comments.append("X=y")
        assert not chain.check_if_tempfile_needed()
        chain.write_io(handle)
        out = handle.getvalue()
        assert len(out) == len(buf), "in-place write must not resize"
        chain2 = MetadataChain.read_io(_io.BytesIO(out))
        assert any(c == "X=y" for c in chain2.get(VorbisComment).comments)
        pcm, _si, _ = decode_bytes(out)
        np.testing.assert_array_equal(pcm, decode_bytes(bytes(buf))[0])

    def test_write_io_tempfile_when_grown(self, tmp_path):
        import io as _io

        p = _make_file(tmp_path)
        data = open(p, "rb").read()
        chain = MetadataChain.read_io(_io.BytesIO(data))
        vc = chain.get(VorbisComment)
        vc.comments.append("BIG=" + "z" * 4096)
        with pytest.raises(MetadataIOError):
            chain.write_io(_io.BytesIO(data))
        tmp = _io.BytesIO()
        chain.write_io_tempfile(_io.BytesIO(data), tmp)
        out = tmp.getvalue()
        chain2 = MetadataChain.read_io(_io.BytesIO(out))
        assert any(c.startswith("BIG=") for c in chain2.get(VorbisComment).comments)
        np.testing.assert_array_equal(decode_bytes(out)[0], decode_bytes(data)[0])

    def test_read_ogg_io(self, tmp_path):
        import io as _io

        from flac_tpu.ogg import ogg_from_flac_stream

        p = _make_file(tmp_path)
        oga = ogg_from_flac_stream(open(p, "rb").read(), serial=3)
        chain = MetadataChain.read_io(_io.BytesIO(oga))
        assert chain._is_ogg and isinstance(chain.blocks[0], StreamInfo)
