// Native on-disk block store: the `t4` equivalent.
//
// Reference behavior: the `t4` async KV store used by liquid-cache
// (`t4::mount(path)`, put/get/get_range/remove; builders.rs:117-141,
// core.rs:814-860) keyed by 8-byte entry ids.  This is an append-only
// log file with an in-memory key -> (offset, len) index.  Unlike a
// Python implementation, reads use pread and take only a shared lock,
// so concurrent range reads (the squeeze-hydration path) proceed in
// parallel.  Crash-forgetting by design, matching the reference: the
// index is not reloaded on restart.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <shared_mutex>
#include <string>
#include <unordered_map>
#include <vector>

#include <fcntl.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Range { uint64_t off, len; };

struct Store {
  int fd = -1;
  std::shared_mutex mu;                 // guards index
  std::mutex write_mu;                  // serializes appends
  std::unordered_map<uint64_t, Range> index;
  uint64_t tail = 0;
  std::atomic<uint64_t> live_bytes{0};
  std::string path;
};

bool pread_full(int fd, uint8_t *out, uint64_t len, uint64_t off) {
  uint64_t done = 0;
  while (done < len) {
    ssize_t r = pread(fd, out + done, len - done, (off_t)(off + done));
    if (r <= 0) return false;
    done += (uint64_t)r;
  }
  return true;
}

bool pwrite_full(int fd, const uint8_t *data, uint64_t len, uint64_t off) {
  uint64_t done = 0;
  while (done < len) {
    ssize_t r = pwrite(fd, data + done, len - done, (off_t)(off + done));
    if (r < 0) return false;
    done += (uint64_t)r;
  }
  return true;
}

}  // namespace

extern "C" {

void *lqt_store_open(const char *path) {
  int fd = ::open(path, O_RDWR | O_CREAT, 0644);
  if (fd < 0) return nullptr;
  auto *s = new Store();
  s->fd = fd;
  s->path = path;
  struct stat st;
  if (fstat(fd, &st) == 0) s->tail = (uint64_t)st.st_size;
  return s;
}

void lqt_store_close(void *h) {
  auto *s = (Store *)h;
  if (s->fd >= 0) ::close(s->fd);
  delete s;
}

// 0 on success; fills off_out with the record offset.
int lqt_store_put(void *h, uint64_t key, const uint8_t *data, uint64_t len,
                  uint64_t *off_out) {
  auto *s = (Store *)h;
  std::lock_guard<std::mutex> wl(s->write_mu);
  uint64_t off = s->tail;
  if (!pwrite_full(s->fd, data, len, off)) return -1;
  s->tail = off + len;
  {
    std::unique_lock<std::shared_mutex> l(s->mu);
    auto it = s->index.find(key);
    if (it != s->index.end())
      s->live_bytes.fetch_sub(it->second.len);
    s->index[key] = {off, len};
    s->live_bytes.fetch_add(len);
  }
  if (off_out) *off_out = off;
  return 0;
}

int64_t lqt_store_get_len(void *h, uint64_t key) {
  auto *s = (Store *)h;
  std::shared_lock<std::shared_mutex> l(s->mu);
  auto it = s->index.find(key);
  return it == s->index.end() ? -1 : (int64_t)it->second.len;
}

int lqt_store_get(void *h, uint64_t key, uint8_t *out, uint64_t cap) {
  auto *s = (Store *)h;
  Range r;
  {
    std::shared_lock<std::shared_mutex> l(s->mu);
    auto it = s->index.find(key);
    if (it == s->index.end()) return -1;
    r = it->second;
  }
  if (r.len > cap) return -2;
  return pread_full(s->fd, out, r.len, r.off) ? 0 : -3;
}

int lqt_store_read_range(void *h, uint64_t off, uint64_t len, uint8_t *out) {
  auto *s = (Store *)h;
  return pread_full(s->fd, out, len, off) ? 0 : -3;
}

uint64_t lqt_store_remove(void *h, uint64_t key) {
  auto *s = (Store *)h;
  std::unique_lock<std::shared_mutex> l(s->mu);
  auto it = s->index.find(key);
  if (it == s->index.end()) return 0;
  uint64_t freed = it->second.len;
  s->live_bytes.fetch_sub(freed);
  s->index.erase(it);
  return freed;
}

int lqt_store_contains(void *h, uint64_t key) {
  auto *s = (Store *)h;
  std::shared_lock<std::shared_mutex> l(s->mu);
  return s->index.count(key) ? 1 : 0;
}

int lqt_store_range_of(void *h, uint64_t key, uint64_t *off, uint64_t *len) {
  auto *s = (Store *)h;
  std::shared_lock<std::shared_mutex> l(s->mu);
  auto it = s->index.find(key);
  if (it == s->index.end()) return -1;
  *off = it->second.off;
  *len = it->second.len;
  return 0;
}

uint64_t lqt_store_file_bytes(void *h) {
  auto *s = (Store *)h;
  std::lock_guard<std::mutex> wl(s->write_mu);
  return s->tail;
}

uint64_t lqt_store_live_bytes(void *h) {
  return ((Store *)h)->live_bytes.load();
}

// Rewrite live records contiguously, dropping holes.  Blocks writers and
// readers for the duration.
int lqt_store_compact(void *h) {
  auto *s = (Store *)h;
  std::lock_guard<std::mutex> wl(s->write_mu);
  std::unique_lock<std::shared_mutex> l(s->mu);
  std::string tmp = s->path + ".compact";
  int out = ::open(tmp.c_str(), O_RDWR | O_CREAT | O_TRUNC, 0644);
  if (out < 0) return -1;
  // copy in offset order for sequential IO
  std::vector<std::pair<uint64_t, Range>> items(s->index.begin(), s->index.end());
  std::sort(items.begin(), items.end(), [](const auto &a, const auto &b) {
    return a.second.off < b.second.off;
  });
  std::vector<uint8_t> buf;
  uint64_t pos = 0;
  for (auto &kv : items) {
    buf.resize(kv.second.len);
    if (!pread_full(s->fd, buf.data(), kv.second.len, kv.second.off) ||
        !pwrite_full(out, buf.data(), kv.second.len, pos)) {
      ::close(out);
      ::unlink(tmp.c_str());
      return -1;
    }
    kv.second.off = pos;
    pos += kv.second.len;
  }
  if (::rename(tmp.c_str(), s->path.c_str()) != 0) {
    ::close(out);
    ::unlink(tmp.c_str());
    return -1;
  }
  ::close(s->fd);
  s->fd = out;
  s->tail = pos;
  s->index.clear();
  for (auto &kv : items) s->index[kv.first] = kv.second;
  return 0;
}

}  // extern "C"
