"""Golden scores pinned from the compiled reference binary.

Every value below was produced by the reference's own serial kernel
(``src/serial/serial.cpp`` + ``src/common/driver.cpp``, compiled with
``g++ -O2 -std=c++11``) run on the corpus pair of that name — the strongest
external ground truth available (round 1 pinned 2gb/64gb; round 2 ran the
binary on the remaining benched sizes, full 64 GB-table allocations in RAM).

Used by ``tests/test_golden_scores.py`` and by ``cli.py bench``'s score
cross-check (a bench refuses to emit a row whose score mismatches the pin).
All pins are for the reference's compiled-in scoring
(MATCH=1, MISMATCH=0, GAP=-1, global — ``needleman-wunsch.hpp:11-13``).
"""

#: corpus pair name -> reference serial binary's printed ``Score:``
GOLDEN_NW_UNIT = {
    "small": 2,
    "debug": 27,
    "t": 17,
    "smid": 5839,
    "2gb": 12958,
    "4gb": 18461,
    "8gb": 26186,
    "12gb": 32027,
    "16gb": 36980,
    "24gb": 45131,
    "32gb": 52216,
    "40gb": 57883,
    "48gb": 64070,
    "64gb": 73888,
}
