"""fft_gkr.draw_schedule / prove_messages == fft_gkr.run on the shared
glibc stream: the schedule consumes exactly the same draws (so challenges
drawn after it stay aligned), and the feed-forward message tape replays
cleanly through run()'s verifier checks."""

import numpy as np

from virgo_plus_tpu.pc import fft_gkr
from virgo_plus_tpu.utils.glibc_rand import GlibcRandom


def test_schedule_stream_and_tape_match_run():
    lg = 3
    # run() in record mode from a fresh stream
    rng_a = GlibcRandom(3396)
    res = fft_gkr.run(lg, rng_a)
    assert res.ok

    # draw_schedule from the same fresh stream must leave the rng in the
    # same position (next draws equal)...
    rng_b = GlibcRandom(3396)
    d = fft_gkr.draw_schedule(lg, rng_b)
    for _ in range(4):
        assert rng_a.field_element() == rng_b.field_element()

    # ...and prove_messages must produce the exact tape run() recorded
    msgs = fft_gkr.prove_messages(lg, d)
    assert len(msgs) == len(res.messages)
    for k, (got, want) in enumerate(zip(msgs, res.messages)):
        assert np.array_equal(np.asarray(got), np.asarray(want)), k

    # and the tape replays through run()'s verifier checks
    rng_c = GlibcRandom(3396)
    res2 = fft_gkr.run(lg, rng_c, replay=[np.asarray(m) for m in msgs])
    assert res2.ok
