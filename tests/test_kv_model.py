"""Randomized model test: the native store vs a plain dict-of-dicts
oracle over thousands of random operations, with periodic reopen and
compaction (the storage subsystem's confidence backstop)."""

import numpy as np
import pytest

from clipx.store import kv


@pytest.mark.parametrize("seed", [42, 7, 1234])
def test_randomized_ops_match_dict_model(tmp_path, seed):
    rng = np.random.RandomState(seed)
    path = str(tmp_path / "env")
    env = kv.open_env(path)
    db_names = [b"fn_db", b"skip_db", b"idx_db"]
    dbs = {name: env.open_db(name) for name in db_names}
    model = {name: {} for name in db_names}

    def rand_key():
        return f"k{rng.randint(200):03d}".encode()

    def rand_val():
        return rng.bytes(rng.randint(1, 200))

    for step in range(240):
        name = db_names[rng.randint(3)]
        db = dbs[name]
        op = rng.randint(5)
        if op <= 1:  # batch of puts
            with env.begin(db=db, write=True) as txn:
                for _ in range(rng.randint(1, 20)):
                    k, v = rand_key(), rand_val()
                    txn.put(k, v)
                    model[name][k] = v
        elif op == 2:  # deletes
            with env.begin(db=db, write=True) as txn:
                for _ in range(rng.randint(1, 10)):
                    k = rand_key()
                    txn.delete(k)
                    model[name].pop(k, None)
        elif op == 3:  # aborted txn changes nothing
            try:
                with env.begin(db=db, write=True) as txn:
                    txn.put(b"doomed", b"x")
                    raise RuntimeError
            except RuntimeError:
                pass
        else:  # verify full state: gets, cursor order, stat
            with env.begin(db=db) as txn:
                assert txn.stat()["entries"] == len(model[name])
                items = list(txn.cursor())
                assert items == sorted(model[name].items())
                for k in (rand_key() for _ in range(5)):
                    assert txn.get(k) == model[name].get(k)
        if step % 20 == 19:
            env.close()
            env = kv.open_env(path)
            dbs = {name: env.open_db(name) for name in db_names}
        if step % 15 == 14:  # frequent compaction: the sorted-segment +
            # overlay merge (cursor, counts, tombstones) is the state
            # most ops then run against
            env.compact()

    for name in db_names:
        with env.begin(db=dbs[name]) as txn:
            assert list(txn.cursor()) == sorted(model[name].items())
    env.close()
