// clipx host-native key-value store.
//
// LMDB-equivalent storage for the framework (the reference links liblmdb
// via py-lmdb: reference:build-index.py:22-24, reference:query-index.py:25-27;
// neither the wheel nor the C library exists in this environment, so the
// store is implemented here from scratch). Same observable model:
//
//   * an environment is a directory holding named sub-databases
//   * byte-string keys and values
//   * read and write transactions; write transactions are atomic and
//     durable (buffered ops -> WAL append + fsync -> in-memory apply)
//   * cursors iterate a database in lexicographic byte order — the
//     property the indexer relies on for stable id assignment
//     (reference:build-index.py:75-88)
//   * a single writer at a time, enforced across processes with flock(2)
//     on <env>/LOCK (the reference documents multi-writer corruption as a
//     known issue; we prevent it instead)
//
// Design: append-only write-ahead log replayed into per-database ordered
// maps at open. Readers and the writer share one env mutex taken per
// *operation* (not per transaction), so the reference's pattern of a
// long-lived read cursor over fn_db interleaved with write transactions
// on idx_db (reference:build-index.py:68-88) cannot deadlock. std::map
// iterator stability makes in-place mutation safe while cursors hold only
// their current key. Compaction rewrites the log when garbage accumulates.
//
// Exposed as a C ABI for ctypes (clipx/store/kv.py).

#include <sys/file.h>
#include <sys/stat.h>
#include <sys/types.h>
#include <fcntl.h>
#include <unistd.h>

#include <cstdint>
#include <cstring>
#include <deque>
#include <map>
#include <memory>
#include <mutex>
#include <string>
#include <vector>

namespace {

constexpr char kMagic[8] = {'C', 'X', 'K', 'V', '0', '0', '1', '\n'};
constexpr uint8_t kOpPut = 1;
constexpr uint8_t kOpDel = 2;

using Map = std::map<std::string, std::string>;

struct Env {
    std::string dir;
    std::mutex mu;                      // protects dbs + log fd
    std::map<std::string, int> db_ids;  // name -> id
    std::vector<std::string> db_names;
    std::vector<Map> dbs;
    int log_fd = -1;
    int lock_fd = -1;
    uint64_t log_records = 0;   // total records in log file
    uint64_t live_records = 0;  // records that still matter
    uint64_t log_offset = 0;    // bytes of the log applied to memory
    std::string error;
};

struct PendingOp {
    uint8_t op;
    int db;
    std::string key;
    std::string val;
};

struct Txn {
    Env* env;
    bool write;
    bool done = false;
    std::vector<PendingOp> ops;                 // buffered writes
    std::deque<std::string> read_buf;           // keeps get() results alive
};

struct Cursor {
    Env* env;
    Txn* txn;
    int db;
    bool started = false;
    std::string current_key;
    std::deque<std::string> buf;
};

// ---------------------------------------------------------------------------
// log I/O
// ---------------------------------------------------------------------------

bool write_all(int fd, const void* data, size_t len) {
    const char* p = static_cast<const char*>(data);
    while (len > 0) {
        ssize_t n = ::write(fd, p, len);
        if (n < 0) {
            if (errno == EINTR) continue;
            return false;
        }
        p += n;
        len -= static_cast<size_t>(n);
    }
    return true;
}

void append_record(std::string* out, uint8_t op, const std::string& db,
                   const std::string& key, const std::string& val) {
    uint32_t dl = static_cast<uint32_t>(db.size());
    uint32_t kl = static_cast<uint32_t>(key.size());
    uint32_t vl = static_cast<uint32_t>(val.size());
    out->push_back(static_cast<char>(op));
    out->append(reinterpret_cast<char*>(&dl), 4);
    out->append(reinterpret_cast<char*>(&kl), 4);
    out->append(reinterpret_cast<char*>(&vl), 4);
    out->append(db);
    out->append(key);
    out->append(val);
}

int env_db_id(Env* env, const std::string& name) {
    auto it = env->db_ids.find(name);
    if (it != env->db_ids.end()) return it->second;
    int id = static_cast<int>(env->dbs.size());
    env->db_ids.emplace(name, id);
    env->db_names.push_back(name);
    env->dbs.emplace_back();
    return id;
}

// Replay the log file into memory from `from_offset` (0 = from the
// header). Truncated trailing records (torn writes from a crash) are
// discarded; only the initial open truncates them from disk.
bool replay_log_from(Env* env, const std::string& path,
                     uint64_t from_offset, bool trim_tail) {
    FILE* f = ::fopen(path.c_str(), "rb");
    if (!f) {
        env->log_offset = 8;  // fresh env: header will be written
        return true;
    }
    char magic[8];
    if (::fread(magic, 1, 8, f) != 8 || ::memcmp(magic, kMagic, 8) != 0) {
        ::fclose(f);
        env->error = "bad log magic";
        return false;
    }
    if (from_offset > 8) {
        if (::fseek(f, static_cast<long>(from_offset), SEEK_SET) != 0) {
            ::fclose(f);
            return false;
        }
    }
    std::string db, key, val;
    long good_end = static_cast<long>(from_offset > 8 ? from_offset : 8);
    for (;;) {
        uint8_t op;
        uint32_t dl, kl, vl;
        if (::fread(&op, 1, 1, f) != 1) break;
        if (::fread(&dl, 4, 1, f) != 1) break;
        if (::fread(&kl, 4, 1, f) != 1) break;
        if (::fread(&vl, 4, 1, f) != 1) break;
        db.resize(dl);
        key.resize(kl);
        val.resize(vl);
        if (dl && ::fread(&db[0], 1, dl, f) != dl) break;
        if (kl && ::fread(&key[0], 1, kl, f) != kl) break;
        if (vl && ::fread(&val[0], 1, vl, f) != vl) break;
        int id = env_db_id(env, db);
        if (op == kOpPut) {
            env->dbs[id][key] = val;
        } else if (op == kOpDel) {
            env->dbs[id].erase(key);
        } else {
            break;  // unknown op: treat as torn tail
        }
        env->log_records++;
        good_end = ::ftell(f);
    }
    ::fclose(f);
    if (trim_tail) {
        // trim a torn tail so future appends start on a record boundary
        ::truncate(path.c_str(), good_end);
    }
    env->log_offset = static_cast<uint64_t>(good_end);
    uint64_t live = 0;
    for (const auto& m : env->dbs) live += m.size();
    env->live_records = live;
    return true;
}

// Apply records other processes appended since we last read. Caller
// holds env->mu (and the flock when mutating afterwards). Without this,
// compaction from a long-lived handle would rewrite the log from stale
// memory and drop their committed data.
bool catch_up_locked(Env* env) {
    return replay_log_from(env, env->dir + "/data.cxkv",
                           env->log_offset, /*trim_tail=*/false);
}

std::string log_path(const Env* env) { return env->dir + "/data.cxkv"; }

// Rewrite the log with only live records. Caller holds env->mu AND the
// exclusive flock (so no other process can append between catch-up and
// the rename).
bool compact_locked(Env* env) {
    if (!catch_up_locked(env)) return false;  // never drop others' data
    std::string tmp = env->dir + "/data.cxkv.tmp";
    int fd = ::open(tmp.c_str(), O_CREAT | O_TRUNC | O_WRONLY, 0644);
    if (fd < 0) return false;
    std::string buf(kMagic, 8);
    uint64_t live = 0;
    uint64_t bytes = 0;
    for (size_t id = 0; id < env->dbs.size(); ++id) {
        const std::string& name = env->db_names[id];
        for (const auto& kv : env->dbs[id]) {
            append_record(&buf, kOpPut, name, kv.first, kv.second);
            live++;
            if (buf.size() > (16u << 20)) {
                bytes += buf.size();
                if (!write_all(fd, buf.data(), buf.size())) { ::close(fd); return false; }
                buf.clear();
            }
        }
    }
    bytes += buf.size();
    if (!buf.empty() && !write_all(fd, buf.data(), buf.size())) { ::close(fd); return false; }
    if (::fsync(fd) != 0) { ::close(fd); return false; }
    ::close(fd);
    if (::rename(tmp.c_str(), log_path(env).c_str()) != 0) return false;
    if (env->log_fd >= 0) ::close(env->log_fd);
    env->log_fd = ::open(log_path(env).c_str(), O_WRONLY | O_APPEND, 0644);
    env->log_records = live;
    env->live_records = live;
    env->log_offset = bytes;
    return env->log_fd >= 0;
}

}  // namespace

extern "C" {

void* cxkv_open(const char* path) {
    auto env = std::make_unique<Env>();
    env->dir = path;
    ::mkdir(path, 0755);
    std::string lp = env->dir + "/LOCK";
    env->lock_fd = ::open(lp.c_str(), O_CREAT | O_RDWR, 0644);
    if (env->lock_fd < 0) return nullptr;
    // The open-time replay trims torn tails from disk. Without the
    // exclusive flock, a record that merely hasn't finished being
    // appended by a live writer is indistinguishable from a crash
    // remnant: truncating it would chop a committed-in-progress
    // transaction whose writer then appends the remainder at the new
    // EOF and reports it durable. Hold the flock so a partial record
    // seen here really is a torn tail.
    if (::flock(env->lock_fd, LOCK_EX) != 0) return nullptr;
    if (!replay_log_from(env.get(), env->dir + "/data.cxkv", 0,
                         /*trim_tail=*/true)) {
        ::flock(env->lock_fd, LOCK_UN);
        return nullptr;
    }
    std::string dp = log_path(env.get());
    env->log_fd = ::open(dp.c_str(), O_CREAT | O_WRONLY | O_APPEND, 0644);
    if (env->log_fd < 0) {
        ::flock(env->lock_fd, LOCK_UN);
        return nullptr;
    }
    // write magic if the file is new
    struct stat st;
    if (::fstat(env->log_fd, &st) == 0 && st.st_size == 0) {
        if (!write_all(env->log_fd, kMagic, 8)) {
            ::flock(env->lock_fd, LOCK_UN);
            return nullptr;
        }
    }
    ::flock(env->lock_fd, LOCK_UN);
    return env.release();
}

void cxkv_close(void* handle) {
    Env* env = static_cast<Env*>(handle);
    if (!env) return;
    {
        std::lock_guard<std::mutex> g(env->mu);
        // opportunistic compaction: reclaim when >half the log is garbage
        if (env->log_records > 1024 &&
            env->live_records * 2 < env->log_records &&
            ::flock(env->lock_fd, LOCK_EX) == 0) {
            // compact_locked requires the exclusive flock: it rewrites
            // the log from memory after a catch-up, and a commit landing
            // between the catch-up and the rename would be dropped.
            compact_locked(env);
            ::flock(env->lock_fd, LOCK_UN);
        }
    }
    if (env->log_fd >= 0) ::close(env->log_fd);
    if (env->lock_fd >= 0) ::close(env->lock_fd);
    delete env;
}

int cxkv_db(void* handle, const char* name) {
    Env* env = static_cast<Env*>(handle);
    std::lock_guard<std::mutex> g(env->mu);
    return env_db_id(env, name);
}

uint64_t cxkv_entries(void* handle, int db) {
    Env* env = static_cast<Env*>(handle);
    std::lock_guard<std::mutex> g(env->mu);
    if (db < 0 || db >= static_cast<int>(env->dbs.size())) return 0;
    return env->dbs[db].size();
}

void* cxkv_txn_begin(void* handle, int write) {
    Env* env = static_cast<Env*>(handle);
    auto txn = std::make_unique<Txn>();
    txn->env = env;
    txn->write = write != 0;
    return txn.release();
}

int cxkv_put(void* th, int db, const char* k, size_t klen,
             const char* v, size_t vlen) {
    Txn* txn = static_cast<Txn*>(th);
    if (!txn->write || txn->done) return -1;
    txn->ops.push_back({kOpPut, db, std::string(k, klen), std::string(v, vlen)});
    return 0;
}

int cxkv_del(void* th, int db, const char* k, size_t klen) {
    Txn* txn = static_cast<Txn*>(th);
    if (!txn->write || txn->done) return -1;
    txn->ops.push_back({kOpDel, db, std::string(k, klen), std::string()});
    return 0;
}

const char* cxkv_get(void* th, int db, const char* k, size_t klen,
                     size_t* vlen) {
    Txn* txn = static_cast<Txn*>(th);
    Env* env = txn->env;
    std::string key(k, klen);
    // read-your-writes: newest pending op on this key wins
    for (auto it = txn->ops.rbegin(); it != txn->ops.rend(); ++it) {
        if (it->db == db && it->key == key) {
            if (it->op == kOpDel) return nullptr;
            txn->read_buf.push_back(it->val);
            *vlen = txn->read_buf.back().size();
            return txn->read_buf.back().data();
        }
    }
    std::lock_guard<std::mutex> g(env->mu);
    if (db < 0 || db >= static_cast<int>(env->dbs.size())) return nullptr;
    auto it = env->dbs[db].find(key);
    if (it == env->dbs[db].end()) return nullptr;
    txn->read_buf.push_back(it->second);
    *vlen = txn->read_buf.back().size();
    return txn->read_buf.back().data();
}

int cxkv_txn_commit(void* th) {
    std::unique_ptr<Txn> txn(static_cast<Txn*>(th));
    if (txn->done) return -1;
    txn->done = true;
    if (!txn->write || txn->ops.empty()) return 0;
    Env* env = txn->env;

    // cross-process single-writer: hold the flock only for the commit
    if (::flock(env->lock_fd, LOCK_EX) != 0) return -2;
    std::lock_guard<std::mutex> g(env->mu);
    // fold in records other processes appended since we last read, so
    // our in-memory state (and log_offset) match the file before we
    // extend it
    if (!catch_up_locked(env)) {
        ::flock(env->lock_fd, LOCK_UN);
        return -4;
    }
    // a process that died mid-append leaves a torn tail; appending after
    // it would orphan our records behind an unparseable prefix. We hold
    // the exclusive flock, so trimming is safe.
    struct stat st;
    if (::stat(log_path(env).c_str(), &st) == 0 &&
        static_cast<uint64_t>(st.st_size) != env->log_offset) {
        ::truncate(log_path(env).c_str(), env->log_offset);
    }
    std::string buf;
    for (const auto& op : txn->ops) {
        append_record(&buf, op.op, env->db_names[op.db], op.key, op.val);
    }
    bool ok = write_all(env->log_fd, buf.data(), buf.size()) &&
              ::fdatasync(env->log_fd) == 0;
    if (ok) {
        for (const auto& op : txn->ops) {
            if (op.op == kOpPut) {
                auto res = env->dbs[op.db].emplace(op.key, op.val);
                if (!res.second) res.first->second = op.val;
                else env->live_records++;
            } else {
                env->live_records -= env->dbs[op.db].erase(op.key);
            }
            env->log_records++;
        }
        env->log_offset += buf.size();
    }
    ::flock(env->lock_fd, LOCK_UN);
    return ok ? 0 : -3;
}

void cxkv_txn_abort(void* th) {
    std::unique_ptr<Txn> txn(static_cast<Txn*>(th));
    if (txn) txn->done = true;
}

void* cxkv_cursor_open(void* th, int db) {
    Txn* txn = static_cast<Txn*>(th);
    auto cur = std::make_unique<Cursor>();
    cur->env = txn->env;
    cur->txn = txn;
    cur->db = db;
    return cur.release();
}

// Shared advance: mode 0 = first, 1 = next (strictly after current_key).
// Returns 1 and fills k/v on success, 0 at end.
static int cursor_step(Cursor* cur, int mode, const char** k, size_t* klen,
                       const char** v, size_t* vlen) {
    Env* env = cur->env;
    std::lock_guard<std::mutex> g(env->mu);
    if (cur->db < 0 || cur->db >= static_cast<int>(env->dbs.size())) return 0;
    const Map& m = env->dbs[cur->db];
    Map::const_iterator it;
    if (mode == 0) {
        it = m.begin();
    } else {
        it = m.upper_bound(cur->current_key);
    }
    if (it == m.end()) return 0;
    cur->started = true;
    cur->current_key = it->first;
    cur->buf.clear();
    cur->buf.push_back(it->first);
    cur->buf.push_back(it->second);
    *k = cur->buf[0].data();
    *klen = cur->buf[0].size();
    *v = cur->buf[1].data();
    *vlen = cur->buf[1].size();
    return 1;
}

int cxkv_cursor_first(void* ch, const char** k, size_t* klen,
                      const char** v, size_t* vlen) {
    return cursor_step(static_cast<Cursor*>(ch), 0, k, klen, v, vlen);
}

int cxkv_cursor_next(void* ch, const char** k, size_t* klen,
                     const char** v, size_t* vlen) {
    Cursor* cur = static_cast<Cursor*>(ch);
    return cursor_step(cur, cur->started ? 1 : 0, k, klen, v, vlen);
}

void cxkv_cursor_close(void* ch) {
    delete static_cast<Cursor*>(ch);
}

int cxkv_compact(void* handle) {
    Env* env = static_cast<Env*>(handle);
    if (::flock(env->lock_fd, LOCK_EX) != 0) return -1;
    std::lock_guard<std::mutex> g(env->mu);
    bool ok = compact_locked(env);
    ::flock(env->lock_fd, LOCK_UN);
    return ok ? 0 : -2;
}

int cxkv_refresh(void* handle) {
    // pick up records committed by other processes since open/last
    // refresh (a reader that wants live data calls this; a partially
    // appended tail simply stops the parse and is retried next time)
    Env* env = static_cast<Env*>(handle);
    std::lock_guard<std::mutex> g(env->mu);
    return catch_up_locked(env) ? 0 : -1;
}

int cxkv_sync(void* handle) {
    Env* env = static_cast<Env*>(handle);
    std::lock_guard<std::mutex> g(env->mu);
    return ::fdatasync(env->log_fd) == 0 ? 0 : -1;
}

}  // extern "C"
