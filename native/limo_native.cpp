// limo_native — native runtime components for the TPU LIMO engine.
//
// The reference's runtime is C++ end-to-end; here the host-side hot paths
// that sit outside the XLA device programs are native too:
//   * velodyne .bin reading (KITTI float32 x,y,z,intensity quads —
//     behavior contract: reference utility.h:11-38), single + threaded batch
//   * the track-table engine: maintaining feature tracks across frames
//     (ids, ages, ring-buffered uvd history) — the O(features × window)
//     bookkeeping that backs Tracklets (matches_msg_types semantics:
//     newest-first stamps, d = -1 no depth)
//
// Exposed as a C ABI for ctypes (no pybind11 in this image).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <thread>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Velodyne readers
// ---------------------------------------------------------------------------

// Returns number of points read (floats/4), or -1 on error. Caller provides
// the buffer and its capacity in points.
int64_t ln_read_velodyne(const char* path, float* out, int64_t capacity_pts) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    std::fseek(f, 0, SEEK_END);
    long bytes = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    int64_t pts = bytes / (4 * sizeof(float));
    if (pts > capacity_pts) pts = capacity_pts;
    size_t got = std::fread(out, 4 * sizeof(float), (size_t)pts, f);
    std::fclose(f);
    return (int64_t)got;
}

int64_t ln_velodyne_size(const char* path) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    std::fseek(f, 0, SEEK_END);
    long bytes = std::ftell(f);
    std::fclose(f);
    return bytes / (4 * (int64_t)sizeof(float));
}

// Threaded batch read: n files, each into out + i*capacity_pts*4 floats,
// zero-padded; writes per-file point counts into counts.
void ln_read_velodyne_batch(const char** paths, int64_t n, float* out,
                            int64_t capacity_pts, int64_t* counts,
                            int32_t n_threads) {
    if (n_threads <= 0) n_threads = (int32_t)std::thread::hardware_concurrency();
    std::atomic<int64_t> next{0};
    auto work = [&]() {
        for (;;) {
            int64_t i = next.fetch_add(1);
            if (i >= n) break;
            float* dst = out + i * capacity_pts * 4;
            std::memset(dst, 0, (size_t)capacity_pts * 4 * sizeof(float));
            counts[i] = ln_read_velodyne(paths[i], dst, capacity_pts);
        }
    };
    std::vector<std::thread> pool;
    for (int32_t t = 0; t < n_threads; ++t) pool.emplace_back(work);
    for (auto& th : pool) th.join();
}

// ---------------------------------------------------------------------------
// Track table engine
// ---------------------------------------------------------------------------

struct Track {
    int64_t id;
    int32_t age;                 // total observations
    int32_t last_frame;          // frame counter of newest observation
    // newest-first ring of (frame, u, v, d)
    std::vector<float> uvd;      // 3 * len
    std::vector<int32_t> frames; // len
};

struct TrackTable {
    int64_t next_id = 0;
    int32_t frame_counter = -1;
    int32_t max_len;
    std::vector<double> stamps;              // newest-first
    std::unordered_map<int64_t, Track> tracks;
    std::vector<int64_t> live;               // feature index -> track id (last frame)
};

void* ln_tracktable_new(int32_t max_track_length) {
    auto* t = new TrackTable();
    t->max_len = max_track_length;
    return t;
}

void ln_tracktable_free(void* h) { delete (TrackTable*)h; }

// Push a frame: n features with uv[2n], optional depth[n] (nullptr → -1),
// prev_match[n] (index into previous frame's features, -1 new track).
void ln_tracktable_push(void* h, double stamp, const float* uv,
                        const float* depth, const int64_t* prev_match,
                        int64_t n) {
    auto* T = (TrackTable*)h;
    T->frame_counter++;
    T->stamps.insert(T->stamps.begin(), stamp);
    if ((int32_t)T->stamps.size() > T->max_len) T->stamps.pop_back();

    std::vector<int64_t> new_live((size_t)n, -1);
    for (int64_t i = 0; i < n; ++i) {
        int64_t tid = -1;
        int64_t j = prev_match ? prev_match[i] : -1;
        if (j >= 0 && j < (int64_t)T->live.size()) tid = T->live[(size_t)j];
        if (tid < 0) {
            tid = T->next_id++;
            T->tracks.emplace(tid, Track{tid, 0, T->frame_counter, {}, {}});
        }
        Track& tr = T->tracks[tid];
        tr.uvd.insert(tr.uvd.begin(), {uv[2 * i], uv[2 * i + 1],
                                       depth ? depth[i] : -1.0f});
        tr.frames.insert(tr.frames.begin(), T->frame_counter);
        if ((int32_t)tr.frames.size() > T->max_len) {
            tr.frames.pop_back();
            tr.uvd.resize(tr.uvd.size() - 3);
        }
        tr.age++;
        tr.last_frame = T->frame_counter;
        new_live[(size_t)i] = tid;
    }
    // garbage-collect tracks that slid out of the window
    int32_t min_frame = T->frame_counter - (int32_t)T->stamps.size() + 1;
    for (auto it = T->tracks.begin(); it != T->tracks.end();) {
        if (it->second.last_frame < min_frame) it = T->tracks.erase(it);
        else ++it;
    }
    T->live = std::move(new_live);
}

int64_t ln_tracktable_num_tracks(void* h) {
    return (int64_t)((TrackTable*)h)->tracks.size();
}

int32_t ln_tracktable_num_stamps(void* h) {
    return (int32_t)((TrackTable*)h)->stamps.size();
}

// Export the dense Tracklets arrays (newest-first stamp axis).
// uvd: [n_tracks, n_stamps, 3], mask: [n_tracks, n_stamps] (uint8),
// ids/ages: [n_tracks], stamps: [n_stamps]. Caller sizes buffers from the
// two count functions. Track order: ascending id (deterministic).
void ln_tracktable_export(void* h, float* uvd, uint8_t* mask, int64_t* ids,
                          int32_t* ages, double* stamps) {
    auto* T = (TrackTable*)h;
    int32_t S = (int32_t)T->stamps.size();
    std::vector<int64_t> order;
    order.reserve(T->tracks.size());
    for (auto& kv : T->tracks) order.push_back(kv.first);
    std::sort(order.begin(), order.end());
    for (int32_t s = 0; s < S; ++s) stamps[s] = T->stamps[(size_t)s];
    int64_t r = 0;
    for (int64_t tid : order) {
        Track& tr = T->tracks[tid];
        ids[r] = tid;
        ages[r] = tr.age;
        float* row = uvd + r * S * 3;
        uint8_t* mrow = mask + r * S;
        for (int32_t s = 0; s < S; ++s) {
            row[s * 3 + 0] = 0.f; row[s * 3 + 1] = 0.f; row[s * 3 + 2] = -1.f;
            mrow[s] = 0;
        }
        for (size_t k = 0; k < tr.frames.size(); ++k) {
            int32_t si = T->frame_counter - tr.frames[k]; // newest-first index
            if (si < 0 || si >= S) continue;
            row[si * 3 + 0] = tr.uvd[k * 3 + 0];
            row[si * 3 + 1] = tr.uvd[k * 3 + 1];
            row[si * 3 + 2] = tr.uvd[k * 3 + 2];
            mrow[si] = 1;
        }
        ++r;
    }
}

}  // extern "C"
