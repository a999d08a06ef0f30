// Standalone C++ host for the TPU SLAM runtime — the reference's
// `run_vido` binary shape (demo/run_vido_slam.cc): a pure C++ process that
// owns VIDO_SLAM::System, here embedding CPython + the JAX runtime through
// libvido_system.so.
//
//   ./run_vido_native <config.yaml> [n_frames]
//
// Feeds synthetic frames (textured depth, zero flow, empty mask) and prints
// each returned pose's translation — a smoke harness proving the embedded
// interpreter path end-to-end; the real data path goes through the native
// dataloader (native/dataloader.cpp).
//
// Build: make -C native run_vido_native

#include <cstdio>
#include <cstdlib>
#include <vector>

#include "../native/vido_system.h"

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: %s <config.yaml> [n_frames]\n", argv[0]);
    return 2;
  }
  const int n_frames = argc > 2 ? std::atoi(argv[2]) : 3;
  const int H = 160, W = 256;

  vido_slam::System slam;
  slam.Init(argv[1], vido_slam::RGBD);

  std::vector<float> depth(H * W), flow(H * W * 2, 0.0f);
  std::vector<int> mask(H * W, 0);
  std::vector<float> pose(16);
  for (int i = 0; i < H * W; ++i) {
    // raw depth (OMD convention: metric * DepthMapFactor=100)
    depth[i] = 100.0f * (8.0f + 4.0f * ((i * 2654435761u >> 16) & 0xff) / 255.0f);
  }
  for (int t = 0; t < n_frames; ++t) {
    slam.TrackRGBD(nullptr, depth.data(), flow.data(), mask.data(), nullptr,
                   t / 10.0, H, W, pose.data());
    std::printf("frame %d: t = [%.4f %.4f %.4f]\n", t, pose[3], pose[7],
                pose[11]);
  }
  std::printf("ok\n");
  return 0;
}
