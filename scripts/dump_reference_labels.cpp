// Golden-label dump harness: runs the REFERENCE deplex extractor
// (/root/reference, built separately — scripts/make_goldens.sh) on a depth
// frame and writes the per-pixel labels as one integer per line. Used only
// to (re)generate data/golden/*_labels.npz conformance anchors; links
// against the reference library, contains no algorithm code itself.
//
// Usage: dump_reference_labels <depth.png> <intrinsics.K> <config.ini|-> <out.csv>
#include <deplex/deplex.h>
#include <deplex/utils/utils.h>

#include <fstream>
#include <iostream>

int main(int argc, char** argv) {
  if (argc != 5) {
    std::cerr << "usage: " << argv[0] << " depth.png K.file config.ini|- out.csv\n";
    return 2;
  }
  deplex::utils::DepthImage image(argv[1]);
  Eigen::Matrix3f K = deplex::utils::readIntrinsics(argv[2]);
  Eigen::MatrixX3f pcd = image.toPointCloud(K);
  deplex::config::Config config =
      (std::string(argv[3]) == "-") ? deplex::config::Config() : deplex::config::Config(argv[3]);
  deplex::PlaneExtractor extractor(image.getHeight(), image.getWidth(), config);
  Eigen::VectorXi labels = extractor.process(pcd);
  std::ofstream out(argv[4]);
  for (Eigen::Index i = 0; i < labels.size(); ++i) out << labels[i] << "\n";
  std::cout << "planes: " << labels.maxCoeff() << " labeled: " << (labels.array() > 0).count()
            << std::endl;
  return 0;
}
